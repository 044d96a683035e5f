package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** I7 stream-static join, I8 stream-stream interval join, A4 rate
  * source, J5 session extensions.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-static join enriches events with a dimension table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "bronze"), (1L, "gold")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF().toDF("event_id", "user_id", "value")
    val q = stream.join(dim, Seq("user_id"))
      .groupBy("tier").agg(sum("value").as("v"))
      .writeStream.format("memory").queryName("enrich_t")
      .outputMode("complete").start()
    mem.addData(Seq((1L, 0L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0), (4L, 9L, 9.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("enrich_t").as[(String, Double)].collect().toMap
    assert(got == Map("bronze" -> 1.0, "gold" -> 5.0)) // user 9: no dim row
  }

  test("stream-stream interval join correlates clicks with purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "1 hour")
    val p = purchases.toDF().toDF("p_user_id", "purchase_ts").withWatermark("purchase_ts", "1 hour")
    val joined = c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_t")
      .outputMode("append").start()
    clicks.addData(Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00"))))
    purchases.addData(Seq(
      (1L, ts("2024-01-01 10:10:00")),   // within 30 min -> joins
      (2L, ts("2024-01-01 11:30:00")))) // too late -> dropped
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssjoin_t").select("user_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("streaming as-of enrichment equals the q_asof_native batch twin on fixture data") {
    import graft.streaming.AsOfEnrich
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the same inputs q_asof_native consumes: purchases as facts,
    // per-(user, second)-collapsed clicks as dimension versions
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id", "sec").agg(max("event_id").as("click_id"))
      .select(col("user_id"), lit(true).as("isRight"), col("sec").as("t"),
        col("click_id").as("payload"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), lit(false).as("isRight"), col("sec").as("t"),
        col("event_id").as("payload"))
    val tagged = clicks.unionByName(purchases)
      .select(col("user_id").as("key"), col("isRight"), col("t"), col("payload"))
      .as[AsOfEnrich.In].collect()

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[AsOfEnrich.In]
      val q = AsOfEnrich.enrich(spark, mem.toDS())
        .writeStream.format("memory").queryName("asof_enrich_t")
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir("asof-enrich"))
        .start()
      // two micro-batches: all versions first, all facts second —
      // versions from batch 1 must persist in ListState to enrich
      // batch-2 facts (the cross-batch property a single batch hides)
      val (b1, b2) = tagged.partition(_.isRight)
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(b2.toSeq)
      q.processAllAvailable()
      q.stop()
      val got = spark.table("asof_enrich_t").as[AsOfEnrich.Out].collect()
        .map(o => (o.lpayload, o.key, o.rpayload, o.lt - o.rt)).toSet
      val expected = SparkEntry.queries("q_asof_native")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(expected.nonEmpty)
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("as-of enrichment: a slow-churn key's LATEST version survives TTL " +
      "eviction (the pinned-newest fallback law, hermetic)") {
    // Driving processing-time TTL end-to-end hung this environment's
    // RocksDB checksum checkpoint manager (all task slots parked in
    // ChecksumCancellableFSDataOutputStream.close — thread-dumped,
    // round 13), so the law is pinned on the factored-pure resolver
    // the processor delegates to. Scenario: the key's only version
    // (t=10) aged out of the TTL'd list, the non-TTL pin holds it —
    // the fact at t=50 must still enrich (the previous implementation
    // silently dropped it).
    import graft.streaming.AsOfEnrich.resolve
    assert(resolve(Array.empty, Some((10L, 100L)), 50L) == Some((10L, 100L)))
    // a pinned version NEWER than the fact is not a valid match
    assert(resolve(Array.empty, Some((60L, 100L)), 50L) == None)
    // list match + older pin: the surviving list row wins
    assert(resolve(Array((20L, 5L)), Some((20L, 5L)), 50L) == Some((20L, 5L)))
    // pin is newest overall and <= fact time: it supersedes any
    // surviving (older) list row — max() picks it
    assert(resolve(Array((20L, 5L)), Some((40L, 9L)), 50L) == Some((40L, 9L)))
    // no version at-or-before the fact anywhere: inner as-of emits none
    assert(resolve(Array((60L, 5L)), Some((60L, 5L)), 50L) == None)
    // payload tiebreak at equal t mirrors the batch operator
    assert(resolve(Array((10L, 1L), (10L, 3L)), Some((10L, 3L)), 50L)
      == Some((10L, 3L)))
  }

  test("socket source ingests wire JSON events (A4: the ZMQ-SUB stand-in)") {
    import graft.streaming.Ingest
    // a minimal TCP publisher: accepts one connection, writes JSON
    // lines (the datagram shape decodeJson expects), keeps the socket
    // open so the source doesn't see EOF before processing
    val server = new java.net.ServerSocket(0)
    val payloads = (1 to 5).map(i =>
      s"""{"event_id":$i,"ts_us":${1704100000000000L + i * 1000000L},""" +
        s""""user_id":${i % 2},"event_type":"click","value":$i.5,"props":"{}"}""")
    @volatile var client: java.net.Socket = null
    val t = new Thread(() => {
      client = server.accept()
      val out = new java.io.PrintWriter(client.getOutputStream, true)
      payloads.foreach(out.println)
      out.flush()
    })
    t.setDaemon(true); t.start()
    try {
      val raw = spark.readStream.format("socket")
        .option("host", "localhost").option("port", server.getLocalPort)
        .load().toDF("payload")
      val events = Ingest.decodeJson(raw)
      val q = events.writeStream.format("memory").queryName("socket_t")
        .outputMode("append").start()
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("socket_t").count() < 5 &&
          System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      q.stop()
      val got = spark.table("socket_t")
      assert(got.count() == 5)
      assert(got.filter(col("event_type") =!= "click").count() == 0)
      assert(got.agg(sum("user_id")).head.getLong(0) == 3) // ids 1..5 % 2 -> 1,0,1,0,1
      assert(got.filter(col("ts").isNull).count() == 0)
    } finally {
      if (client != null) client.close()
      server.close()
    }
  }

  test("rate source produces rows (A4 load-gen stand-in)") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
    val q = rate.writeStream.format("memory").queryName("rate_t")
      .outputMode("append").start()
    Thread.sleep(2500)
    q.processAllAvailable(); q.stop()
    assert(spark.table("rate_t").count() > 0)
  }

  test("q_stream_stream_join_wm runs REAL multi-batch eviction with bounded state " +
      "(peak join state << corpus) and still emits every qualifying pair") {
    // The scale-honest twin's whole point (round 14): time-ordered
    // chunked ingest + a 2 h watermark must (a) actually run many
    // micro-batches, (b) actually EVICT state between them, (c) keep
    // peak state near one-chunk size rather than corpus size, and
    // (d) lose no pairs vs the batch join (cross-chunk disorder is
    // zero by the chunk builder's day-boundary construction).
    val ingestDir = graft.streaming.Ingest.timeChunkedEventDir(spark, sf)
    def side(tpe: String, u: String, t: String) =
      spark.readStream.schema(graft.streaming.Ingest.chunkedEventSchema)
        .option("maxFilesPerTrigger", "1").parquet(ingestDir)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(u), col("ts").as(t))
    val joined = side("purchase", "p_user", "p_ts").withWatermark("p_ts", "2 hours")
      .join(side("click", "c_user", "c_ts").withWatermark("c_ts", "2 hours"),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_wm_t")
      .outputMode("append")
      .option("checkpointLocation", SparkEnv.scratchDir("ssjoin-wm-spec-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val metrics = graft.streaming.StreamMetrics.history(q)
    val dataBatches = metrics.filter(_.numInputRows > 0)
    assert(dataBatches.size >= 5,
      s"expected one micro-batch per ingest chunk, got ${dataBatches.size}")
    val stateOps = metrics.flatMap(_.stateOperators)
    assert(stateOps.map(_.numRowsRemoved).sum > 0,
      s"watermark never evicted any join state: $stateOps")
    val corpus = spark.read
      .schema(graft.streaming.Ingest.chunkedEventSchema).parquet(ingestDir)
    val corpusRows = corpus.count()
    val peak = stateOps.map(_.numRowsTotal).max
    assert(peak > 0 && peak < corpusRows / 2,
      s"peak join state $peak not << corpus $corpusRows — eviction broken?")
    // no pair lost: the emitted set equals the batch interval join
    val batchPairs = {
      val p = corpus.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val c = corpus.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts")).count()
    }
    assert(spark.table("ssjoin_wm_t").count() == batchPairs,
      s"streamed pair count != batch join $batchPairs")
  }

  test("GraftExtensions registers vec_dot on a new session") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force shared session init first
    // getOrCreate returns the default session (ignoring extensions),
    // so clear it to get a fresh session on the SAME SparkContext;
    // restore afterwards. Never stop() — that kills the shared context.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val n = s2.sql(
        "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(n == 11.0)

      // injected optimizer rule: the double-cast HOF fold becomes the
      // codegen'd DotProductF ... (base relation is range(), not a
      // LocalRelation — ConvertToLocalRelation would fold the whole
      // projection to a literal before the plan could be inspected)
      val df = s2.range(1, 2).selectExpr(
        "array(CAST(id AS FLOAT), CAST(2.0 AS FLOAT)) AS a",
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS b")
      val hof = df.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "0D, (acc, v) -> acc + v) AS d")
      assert(hof.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.functions.DotProductF])),
        "expected RewriteDotProduct to fire on the double-cast fold")
      assert(hof.collect().head.getDouble(0) == 11.0)

      // ... but the float-multiply form (different rounding) is left alone
      val floatForm = df.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), " +
          "CAST(0 AS FLOAT), (acc, v) -> acc + v) AS d")
      assert(!floatForm.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.functions.DotProductF])),
        "RewriteDotProduct must not fire on the float-multiply fold")

      // ... and nullable arrays stay un-rewritten (the fold yields NULL
      // for a NULL element; DotProductF would read the slot as 0.0)
      val nullable = s2.range(1, 2).selectExpr(
        "array(CAST(id AS FLOAT), CAST(NULL AS FLOAT)) AS a",
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS b")
      val nullableFold = nullable.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "0D, (acc, v) -> acc + v) AS d")
      assert(!nullableFold.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.functions.DotProductF])),
        "RewriteDotProduct must not fire on containsNull arrays")
      assert(nullableFold.collect().head.isNullAt(0),
        "NULL element must poison the fold")

      // ... and mismatched lengths return NULL through the rewrite,
      // exactly like zip_with's null padding in the original fold —
      // the rule emits If(size(l)=size(r), DotProductF, NULL), so a
      // NULL-producing user query must not become a failed job
      val ragged = s2.range(1, 2).selectExpr(
        "array(CAST(id AS FLOAT), CAST(2.0 AS FLOAT), CAST(5.0 AS FLOAT)) AS a",
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS b")
      val raggedFold = ragged.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "0D, (acc, v) -> acc + v) AS d")
      assert(raggedFold.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.functions.DotProductF])),
        "rewrite should still fire on mismatched lengths (guarded)")
      assert(raggedFold.collect().head.isNullAt(0),
        "mismatched lengths must yield NULL, not throw")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
