package graft

import graft.streaming.{InMemoryServingStore, Serving, StreamDedup, StreamMetrics}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming observability surface: the metered runners must
  * return per-batch progress carrying the three operator alarms —
  * throughput, state-operator rows, watermark lag — for the account
  * cube and the LSH dedup pipelines (round-4 verdict #9).
  */
class StreamMetricsSpec extends SparkSpec {

  test("account-cube runner returns progress with state-operator metrics") {
    val store = new InMemoryServingStore
    val (_, metrics) = Serving.runAccountPipelineMetered(
      spark, sf, store, SparkEnv.scratchDir("metrics-acct-ckpt"))
    assert(metrics.nonEmpty, "AvailableNow run must report at least one batch")
    val withData = metrics.filter(_.numInputRows > 0)
    assert(withData.nonEmpty, "some batch must have ingested the fixture events")
    // the stateful aggregation reports its state store: rows present,
    // and the state cardinality equals the served key space
    val stateOps = withData.flatMap(_.stateOperators)
    assert(stateOps.nonEmpty, "windowed aggregation must report a state operator")
    assert(stateOps.map(_.numRowsTotal).max > 0, stateOps.toString)
    assert(metrics.map(_.stateRowsTotal).max == store.snapshot().size.toLong,
      "state rows must equal the served (account, metric, day) key count")
    // throughput: the processing-rate field an operator graphs
    assert(withData.forall(_.processedRowsPerSecond > 0.0))
  }

  test("watermarked hourly pipeline surfaces watermark + non-negative lag") {
    // the account cube is deliberately unwatermarked (round 12 — see
    // accountDailyCounters scaladoc), so the event-time fields are
    // asserted on the hourly pipeline, which keeps its 1h watermark
    val (_, metrics) = Serving.runPipelineMetered(
      spark, sf, new InMemoryServingStore, SparkEnv.scratchDir("metrics-hourly-ckpt"))
    val lastWm = metrics.flatMap(_.watermark)
    assert(lastWm.nonEmpty, "watermarked pipeline must surface its watermark")
    // watermark lag is computable whenever both watermark and max
    // event time are present, and is non-negative (watermark trails)
    val lags = metrics.flatMap(_.watermarkLagMs)
    assert(lags.nonEmpty && lags.forall(_ >= 0L), lags.toString)
  }

  test("hourly pipeline skips the no-data batch and loses no output (round-15 optimization)") {
    // The runner disables noDataMicroBatches on its cloned session:
    // in UPDATE mode every state change is emitted by its data batch,
    // so the trailing watermark-advance batch was pure machinery.
    // Assert BOTH halves of the claim: (a) no zero-row trailing batch
    // runs, (b) the store equals the batch recompute (the same
    // SQL shape the DuckDB oracle gates at the declared sfs).
    val store = new InMemoryServingStore
    val (_, metrics) = Serving.runPipelineMetered(
      spark, sf, store, SparkEnv.scratchDir("metrics-nodata-ckpt"))
    assert(metrics.nonEmpty && metrics.forall(_.numInputRows > 0),
      s"no-data batches must not run: ${metrics.map(m => (m.batchId, m.numInputRows))}")
    val expected = Tables.events(spark, sf)
      .groupBy(concat_ws("/", col("event_type"), lit("hour"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd-HH")).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = store.snapshot().map(r => r.key -> ((r.nEvents, r.sumValue))).toMap
    assert(got == expected,
      s"store must equal the batch recompute: ${got.size} vs ${expected.size} keys")
  }

  test("streaming dedup query surfaces transformWithState store metrics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamDedupSpec.Doc]
      val q = StreamDedup.candidates(mem.toDF())
        .writeStream.format("memory").queryName("stream_metrics_dedup")
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir("metrics-dedup-ckpt"))
        .start()
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).as[StreamDedupSpec.Doc].collect()
      mem.addData(docs.toSeq)
      q.processAllAvailable()
      val metrics = StreamMetrics.history(q)
      val last = StreamMetrics.latest(q)
      q.stop()
      val stateOps = metrics.flatMap(_.stateOperators)
      assert(stateOps.nonEmpty, "transformWithState must report a state operator")
      assert(stateOps.map(_.numRowsUpdated).sum > 0,
        s"bucket index must have written state: $stateOps")
      assert(last.nonEmpty && metrics.map(_.batchId).contains(last.get.batchId))
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("semantic dedup gate state is bounded by the canonical set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamSemanticDedupSpec.Vec]
      val q = graft.streaming.StreamSemanticDedup.verdicts(mem.toDF(), tau = 0.9)
        .writeStream.format("memory").queryName("stream_metrics_semdedup")
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir("metrics-semdedup-ckpt"))
        .start()
      val vecs = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
        .map { case (i, v) => StreamSemanticDedupSpec.Vec(i, v) }
      mem.addData(vecs.toSeq)
      q.processAllAvailable()
      val metrics = StreamMetrics.history(q)
      q.stop()
      val kept = spark.table("stream_metrics_semdedup")
        .filter(col("is_dup") === false).count()
      val stateOps = metrics.flatMap(_.stateOperators)
      assert(stateOps.nonEmpty, "semantic gate must report a state operator")
      assert(stateOps.map(_.numRowsUpdated).sum > 0, stateOps.toString)
      // state holds ONLY canonical vectors: whether the provider counts
      // keys (buckets) or list elements (kept vectors), the total can
      // never exceed the kept count — duplicates must not enter state
      val maxRows = stateOps.map(_.numRowsTotal).max
      assert(maxRows > 0 && maxRows <= kept,
        s"state rows $maxRows vs kept $kept — duplicates leaked into state?")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("stateSession wires the NIO-fast-path checkpoint manager " +
      "(round-16 optimization) and the store still equals the batch recompute") {
    // (a) the cloned streaming session carries the manager conf (the
    // env override SPARK_GRAFT_CKPT_FM is unset under sbt test, so the
    // local default applies); (b) a full checkpointed run through that
    // manager — offset log, commit log, source log, state deltas —
    // produces the identical store (the oracle re-proves this at the
    // declared sfs; this is the fast in-suite pin).
    val s2 = SparkEnv.stateSession(spark)
    assert(s2.conf.get("spark.sql.streaming.checkpointFileManagerClass")
      .endsWith("GraftLocalCheckpointFileManager"),
      "streaming clones must default to the non-forking checkpoint manager")
    val store = new InMemoryServingStore
    Serving.runPipeline(spark, sf, store, SparkEnv.scratchDir("metrics-fm-ckpt"))
    val expected = Tables.events(spark, sf)
      .groupBy(concat_ws("/", col("event_type"), lit("hour"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd-HH")).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = store.snapshot().map(r => r.key -> ((r.nEvents, r.sumValue))).toMap
    assert(got == expected, s"${got.size} vs ${expected.size} keys")
  }
}
