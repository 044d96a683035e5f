package graft

import graft.streaming.{ParquetServingStore, ServingStore}
import org.apache.spark.sql.functions._

/** Serving-store compaction + retention (round 15, VERDICT r14 #3):
  * read-equivalence across a compaction pass, the dir-count bound,
  * physical tombstone drop, retained-batch replay idempotence, and
  * partition pruning surviving the rewrite. The latency side
  * (lookup flat after compaction vs creeping with accumulated batch
  * dirs) is measured by tools/ServeCompactProf → SCALING.md.
  */
class ServingCompactionSpec extends SparkSpec {

  private def row(k: String, n: Long, v: Double) =
    ServingStore.CounterRow(k, n, v)

  test("compaction: read-equivalent, dir-bounded, tombstones dropped, " +
      "retained replay still idempotent, pruning intact") {
    val store = new ParquetServingStore(spark, SparkEnv.scratchDir("compact-store"))
    // 11 batches over overlapping keys — several re-emissions per key,
    // so latest-batch-wins has real work to resolve
    (0 until 10).foreach { b =>
      store.merge(b, Seq(
        row(s"click/hour/2024-01-0${b % 5 + 1}-1$b", b + 1, b * 1.5),
        row("click/day/2024-01-05", 100 + b, b.toDouble),
        row("view/month/2024-01", 7 + b, 0.25 * b)))
    }
    // batch 10: an n=0 tombstone (the JoinView churn shape) — resolved
    // INSIDE the compacted set, so compaction must drop the key
    store.merge(10, Seq(row("click/day/2024-01-05", 0, 0.0)))
    // batches 11-12 stay retained
    store.merge(11, Seq(row("view/month/2024-01", 40, 4.0)))
    store.merge(12, Seq(row("click/hour/2024-01-03-12", 5, 2.0)))
    val serve = (s: ParquetServingStore) => s.latest()
      .filter(col("nEvents") > 0).orderBy("key").collect().map(_.toString)
    val before = serve(store)
    assert(store.batchDirCount == 13)
    store.compact(retainBatches = 2)
    assert(store.batchDirCount == 3,
      s"expected base + 2 retained dirs, got ${store.batchDirCount}")
    assert(serve(store).sameElements(before),
      "resolved store contents changed across compaction")
    // the tombstoned key is PHYSICALLY gone, not just filtered
    assert(store.latest()
      .filter(col("key") === "click/day/2024-01-05").count() == 0,
      "compaction must drop a key whose resolved value is a tombstone")
    // replaying a retained batch (recovery's only replay) still
    // overwrites exactly its own subtree — contents unchanged
    store.merge(12, Seq(row("click/hour/2024-01-03-12", 5, 2.0)))
    assert(serve(store).sameElements(before))
    assert(store.batchDirCount == 3)
    // the read path still prunes partitions in the compacted base
    val plan = store.lookup("view/month/2024-01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("month"), plan)
    assert(store.lookupRows("view/month/2024-01").map(_.nEvents) == Seq(40L))
    // a second compaction with nothing new to merge is a no-op
    store.compact(retainBatches = 2)
    assert(store.batchDirCount == 3 && serve(store).sameElements(before))
  }

  test("compaction of a decommissioned stream (retain 0) leaves one base dir") {
    val store = new ParquetServingStore(spark, SparkEnv.scratchDir("compact-all"))
    (0 until 5).foreach(b => store.merge(b,
      Seq(row("click/year/2024", b + 1, b.toDouble))))
    store.compact(retainBatches = 0)
    assert(store.batchDirCount == 1)
    assert(store.lookupRows("click/year/2024").map(_.nEvents) == Seq(5L))
  }
}
