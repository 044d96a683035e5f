package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Encoders, SparkSession}

/** Spark 4 transformWithState (SURVEY.md §2 I6, the successor API to
  * flatMapGroupsWithState): per-user running counter with typed
  * ValueState on the RocksDB state store provider.
  */
class TransformWithStateSpec extends SparkSpec {

  test("TWA processor stitches intervals across micro-batches via carried state") {
    import spark.implicits._
    import graft.streaming.TimeWeighted.{Ev, Interval, Processor}
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = mem.toDS().groupByKey(_.user)
        .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
        .writeStream.format("memory").queryName("twa_t")
        .outputMode("append").start()
      // batch 1: user 7 at t=100 (cents 500) then t=160 (cents 700);
      // same-second pair for user 8 must emit nothing (dt = 0)
      mem.addData(Seq(Ev(7L, 100L, 1L, "view", 500L),
        Ev(7L, 160L, 2L, "view", 700L),
        Ev(8L, 100L, 3L, "click", 100L), Ev(8L, 100L, 4L, "click", 200L)))
      q.processAllAvailable()
      // batch 2: user 7's next event CLOSES the interval the carried
      // state holds (t=160, 700 cents, held 40 s)
      mem.addData(Seq(Ev(7L, 200L, 5L, "purchase", 900L)))
      q.processAllAvailable()
      // batch 3 straddle (review finding): user 9's trigger boundary
      // splits a same-second pair — the later-arriving event has the
      // SMALLER (t, event_id), so it must sort BEFORE the carried
      // event, exactly where the batch window's ORDER BY puts it
      mem.addData(Seq(Ev(9L, 100L, 11L, "view", 700L)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(9L, 100L, 10L, "click", 100L),
        Ev(9L, 200L, 12L, "purchase", 900L)))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("twa_t").as[Interval].collect().toSet
      assert(got == Set(Interval(100L, "view", 60L, 500L),
        Interval(160L, "view", 40L, 700L),
        // user 9: (id10, id11) dt=0 suppressed; (id11 "view", id12)
        // carries id11's 700 cents over [100, 200) — NOT id10's 100
        Interval(100L, "view", 100L, 700L)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time timers emit exactly the watermark-certified sessions " +
      "(q_stream_abandoned_sessions' cut is real, not vacuous)") {
    import org.apache.spark.sql.functions._
    // batch truth: sessionize (strict 30-min gap) and split sessions
    // into closed (last + 30min <= corpus max) vs in-flight
    val ev = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val sess = ev
      .withColumn("brk", when(lag(col("ts"), 1).over(w).isNull
        .or(col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double") > 1800.0), 1)
        .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n"))
    val total = sess.count()
    // µs precision throughout — getTimestamp().getTime would ms-floor
    // mx while last_ts keeps µs, a mixed cut matching neither engine
    // on boundary rows (round-12 review)
    val mx = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val closed = sess.filter(
      unix_micros(col("last_ts")) + 1800000000L <= mx).count()
    // the stream must emit exactly the closed set — and the cut must
    // be non-trivial (some user's tail session is in flight)
    val emitted = graft.streaming.AbandonedSessions
      .closedSessions(spark, sf).count()
    assert(emitted == closed, s"timers emitted $emitted, batch closed $closed")
    assert(emitted < total, s"watermark cut is vacuous: all $total sessions closed")
  }

  test("transformWithState keeps per-key running counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDS().groupByKey(_._1)
        .transformWithState(new graft.streaming.Windows.RunningCountProcessor[Long],
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n")
        .writeStream.format("memory").queryName("tws_t")
        .outputMode("update").start()
      mem.addData(Seq((1L, 1L), (1L, 2L), (2L, 1L)))
      q.processAllAvailable()
      mem.addData(Seq((1L, 3L), (2L, 2L), (3L, 1L)))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_t").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      assert(rows == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
