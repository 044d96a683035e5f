package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join splitting (SURVEY §4.2; the round-9 AQE A/B's "why
  * AQE stays on" evidence made structural): a hot join key that lands
  * 90%+ of one side in a single shuffle partition is THE classic
  * 100 TB outage — one straggler task holds the stage. AQE detects
  * the skewed partition at runtime from map output sizes and splits
  * it across tasks (`isSkew=true` on the SMJ), with no manual
  * salting. The repo's q_salted_join covers the MANUAL remedy (when
  * the aggregation itself is skewed); this spec proves the AUTOMATIC
  * one is live for joins, at thresholds lowered from the deployment
  * defaults (256 MB) to fixture scale.
  */
class AqeSkewJoinSpec extends SparkSpec {

  private def skewSession(): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // fixture-scale thresholds: a partition is "skewed" past 32 KB
    // and 2x the median; split targets 16 KB chunks
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    // keep the join a shuffle join and the partitions un-coalesced so
    // the skew detector sees the raw map output
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2
  }

  test("AQE splits the hot-key partition of a skewed sort-merge join") {
    val s2 = skewSession()
    // 100k fact rows, 95% on one key; dim side flat. The aggregate
    // after the join is GLOBAL (partial-aggregated), not keyed:
    // OptimizeSkewedJoin declines to split when a downstream operator
    // requires the join's hash distribution (the split would add a
    // shuffle back) — exactly the production guidance that skewed
    // joins should feed distribution-agnostic consumers.
    val fact = s2.range(0, 100000)
      .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000)
        .as("k"), col("id").as("v"))
    val dim = s2.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 10).as("w"))
    val joined = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
    val row = joined.collect().head // run so AQE finalizes the plan
    assert(row.getLong(0) == 100000L, s"join row count wrong: $row")
    // the split SMJ prints `skew=true`; QueryStage wrappers hide the
    // subtree from collect(), so assert on the final plan rendering
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(finalPlan.contains("SortMergeJoin"), finalPlan)
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark the join skew-split:\n$finalPlan")
  }

  test("skew-split join result equals the non-AQE plan") {
    def run(s: SparkSession): Seq[(Long, Long)] = {
      val fact = s.range(0, 100000)
        .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000)
          .as("k"), col("id").as("v"))
      val dim = s.range(0, 1000)
        .select(col("id").as("k"), (col("id") * 10).as("w"))
      fact.join(dim, "k").groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.enabled", "false")
    off.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    assert(run(skewSession()) == run(off))
  }
}
