package graft

import graft.sources.KvSourceProvider
import graft.streaming.ServingStore
import org.apache.spark.sql.functions._

/** DSv2 KV serving source: schema, prefix/equality pushdown, column
  * pruning, and end-to-end parity with the streaming pipeline's store.
  */
class KvSourceSpec extends SparkSpec {

  private def readStore(name: String) =
    spark.read.format("graft.sources.KvSourceProvider")
      .option("store", name).load()

  test("prefix filter is pushed into the source and rows match") {
    KvSourceProvider.register("t1", Seq(
      ServingStore.CounterRow("click/hour/2024-01-01-00", 5L, 1.5),
      ServingStore.CounterRow("click/hour/2024-01-01-01", 7L, 2.5),
      ServingStore.CounterRow("view/hour/2024-01-01-00", 9L, 3.5)))
    val df = readStore("t1").filter(col("key").startsWith("click/"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters=[StringStartsWith(key,click/)"), scan)
    assert(df.count() == 2)
    assert(df.agg(sum("n_events")).collect().head.getLong(0) == 12L)
  }

  test("key equality pushdown returns the single row; pruning drops columns") {
    KvSourceProvider.register("t2", Seq(
      ServingStore.CounterRow("a", 1L, 0.5),
      ServingStore.CounterRow("b", 2L, 1.0)))
    val df = readStore("t2").filter(col("key") === "b").select("n_events")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("EqualTo(key,b)"), scan)
    // column pruning: the v2 scan's output carries only n_events
    assert(scan.contains("ReadSchema: struct<n_events:bigint>") ||
      !scan.contains("sum_value"), scan)
  }

  test("randomized consistency: DSv2 read equals direct snapshot filter") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val rows = (0 until rnd.nextInt(40)).map { i =>
        val key = s"${"abc" (rnd.nextInt(3))}/${rnd.nextInt(4)}/k$i"
        ServingStore.CounterRow(key, rnd.nextInt(100).toLong, rnd.nextInt(100) / 4.0)
      }
      val name = s"rand$trial"
      KvSourceProvider.register(name, rows)
      val prefix = s"${"abc" (rnd.nextInt(3))}/${rnd.nextInt(4)}"
      val expected = rows.filter(_.key.startsWith(prefix))
      // row path: range partitions + reader-side filters
      val got = readStore(name).filter(col("key").startsWith(prefix))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected.map(r => (r.key, r.nEvents, r.sumValue)).toSet,
        s"trial $trial prefix $prefix")
      // complete-pushdown aggregate path: sums over the same prefix
      // (NULL when nothing matches — SQL semantics)
      val agg = readStore(name).filter(col("key").startsWith(prefix))
        .agg(count(lit(1)), sum("n_events"), sum("sum_value")).collect()(0)
      assert(agg.getLong(0) == expected.size.toLong)
      if (expected.isEmpty) assert(agg.isNullAt(1) && agg.isNullAt(2))
      else {
        assert(agg.getLong(1) == expected.map(_.nEvents).sum)
        assert(math.abs(agg.getDouble(2) - expected.map(_.sumValue).sum) < 1e-9)
      }
    }
  }

  test("DSv2 write path: append merges counters per key, overwrite truncates") {
    KvSourceProvider.register("w1", Seq(
      ServingStore.CounterRow("a", 1L, 0.5)))
    import spark.implicits._
    // append: same-key counters SUM (the HINCRBY semantics)
    Seq(("a", 2L, 1.0), ("b", 3L, 1.5)).toDF("key", "n_events", "sum_value")
      .write.format("graft.sources.KvSourceProvider")
      .option("store", "w1").mode("append").save()
    val afterAppend = readStore("w1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(afterAppend == Set(("a", 3L, 1.5), ("b", 3L, 1.5)), afterAppend)
    // overwrite: truncate-then-write
    Seq(("c", 9L, 9.0)).toDF("key", "n_events", "sum_value")
      .write.format("graft.sources.KvSourceProvider")
      .option("store", "w1").mode("overwrite").save()
    val afterOverwrite = readStore("w1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(afterOverwrite == Set(("c", 9L, 9.0)), afterOverwrite)
    // round trip: read -> transform -> write to a new store
    readStore("w1").withColumn("n_events", col("n_events") * 2)
      .write.format("graft.sources.KvSourceProvider")
      .option("store", "w2").mode("append").save()
    assert(readStore("w2").collect().head.getLong(1) == 18L)
  }

  test("aggregate pushdown: prefix-filtered count/sum answered source-side, no Spark aggregate") {
    KvSourceProvider.register("agg1", Seq(
      ServingStore.CounterRow("click/h/00", 5L, 1.5),
      ServingStore.CounterRow("click/h/01", 7L, 2.5),
      ServingStore.CounterRow("view/h/00", 9L, 4.0)))
    val df = readStore("agg1").filter(col("key").startsWith("click/"))
      .agg(count(lit(1)).as("n"), sum("n_events").as("sn"),
        sum("sum_value").as("sv"))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 12L, 4.0)), r)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan)
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown should leave no Spark-side aggregate:\n$plan")
  }

  test("aggregate pushdown: SUM over a non-matching prefix is NULL, COUNT is 0") {
    KvSourceProvider.register("agg2", Seq(
      ServingStore.CounterRow("click/h/00", 5L, 1.5)))
    val df = readStore("agg2").filter(col("key").startsWith("nope/"))
      .agg(count(lit(1)).as("n"), sum("n_events").as("sn"),
        sum("sum_value").as("sv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan)
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown should leave no Spark-side aggregate:\n$plan")
    val r = df.collect().head
    assert(r.getLong(0) == 0L, r)
    assert(r.isNullAt(1), s"SUM over empty set must be NULL, got $r")
    assert(r.isNullAt(2), s"SUM over empty set must be NULL, got $r")
  }

  test("capstone: stream -> 4-granularity cube -> KV -> DSv2 prefix query == batch rollup") {
    // The whole reference shape end-to-end: events stream in, the
    // single-state multi-granularity cube maintains counters, the KV
    // store serves them, and a prefix query over the DSv2 source
    // (the HTTP read path) returns exactly what a batch rollup of the
    // same events computes.
    val store = new graft.streaming.InMemoryServingStore
    graft.streaming.Serving.runMultiGranularityCube(spark, sf, store,
      SparkEnv.scratchDir("kv-capstone-ckpt"))
    KvSourceProvider.register("capstone", store.snapshot())
    val served = readStore("capstone")
      .filter(col("key").startsWith("click/hour/"))
      .agg(sum("n_events")).collect().head.getLong(0)
    val batch = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .count()
    assert(served == batch,
      s"served hourly click total $served != batch count $batch")
    // and the per-granularity key families all exist
    for (g <- Seq("hour", "day", "month", "year")) {
      assert(readStore("capstone")
        .filter(col("key").startsWith(s"click/$g/")).count() > 0, g)
    }
  }

  test("empty-at-planning store still honors the live-store contract: " +
      "the same frame sees rows published before the next action") {
    KvSourceProvider.register("live1", Seq.empty)
    val df = readStore("live1")
    // one unbounded partition even with zero planning-time keys
    // (round-15 review: an empty partition ARRAY silently changed the
    // snapshot semantics depending on planning-time state)
    assert(df.count() == 0)
    assert(df.rdd.getNumPartitions >= 1,
      "an empty store must still plan a readable partition")
    KvSourceProvider.register("live1", Seq(
      ServingStore.CounterRow("click/day/2024-01-05", 3L, 1.0)))
    assert(df.count() == 1,
      "rows published after planning must be visible to the next action")
  }

  test("store option is case-insensitive; a missing option fails loudly " +
      "at table resolution") {
    KvSourceProvider.register("ci1", Seq(
      ServingStore.CounterRow("k", 1L, 1.0)))
    val df = spark.read.format("graft.sources.KvSourceProvider")
      .option("Store", "ci1").load() // DSv2 options are case-insensitive
    assert(df.count() == 1)
    val err = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.KvSourceProvider").load().count()
    }
    assert(err.getMessage.contains("store"), err.getMessage)
  }

  test("streaming pipeline -> registered snapshot -> SQL over the store") {
    val store = new graft.streaming.InMemoryServingStore
    graft.streaming.Serving.runPipeline(spark, sf, store,
      SparkEnv.scratchDir("kv-src-ckpt"))
    KvSourceProvider.register("pipeline", store.snapshot())
    val df = readStore("pipeline")
    assert(df.count() == store.snapshot().size)
    // the source is a real table: aggregates/projections compose
    val total = df.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == store.snapshot().map(_.nEvents).sum)
  }
}
