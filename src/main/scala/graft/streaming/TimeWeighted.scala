package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming time-weighted average — the real-time twin of
  * `q_time_weighted_avg` (queries/WebAnalytics.scala), sharing its
  * oracle SQL. The batch form needs `lead()` — the NEXT observation
  * closes each interval — which a stream expresses as one value of
  * carried state per user: when a user's next event arrives, the
  * PREVIOUS event's interval is emitted and the new event replaces it.
  * This interval-emission-on-next-observation shape is the standard
  * streaming TWA/gauge pattern (each user's open interval stays
  * pending until observed again; the final open interval has no
  * horizon and is never emitted, exactly the batch form's dropped
  * last row).
  *
  * Within a micro-batch, state + batch rows merge and sort by
  * (t, event_id) — the batch window's exact ordering — so a
  * single-batch run (AvailableNow over the fixture file) is
  * row-identical to the batch lead() form; across batches the
  * changelog contract is the usual one (a user's events arrive in
  * time order across triggers). Money rides as exact cents and
  * weights as whole seconds — Long arithmetic through state and
  * aggregation, one double division at the final projection.
  */
object TimeWeighted {

  case class Ev(user: Long, t: Long, eventId: Long, eventType: String,
      cents: Long)
  case class Interval(t: Long, eventType: String, dt: Long, cents: Long)

  class Processor extends StatefulProcessor[Long, Ev, Interval] {
    @transient private var last: ValueState[Ev] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Ev]("last", Encoders.product[Ev],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Interval] = {
      val batch = rows.toArray
      if (batch.isEmpty) return Iterator.empty
      val carried = if (last.exists()) Some(last.get()) else None
      // sort the carried event INTO the batch, not in front of it: an
      // event straddling triggers with a smaller (t, event_id) than
      // the open interval's start must land before it, exactly where
      // the batch window's ORDER BY would place it — prepending
      // unsorted would silently diverge from the shared oracle
      // (review finding; straddle case pinned in
      // TransformWithStateSpec)
      val chain = (carried.toArray ++ batch).sortBy(e => (e.t, e.eventId))
      last.update(chain.last)
      (1 until chain.length).iterator.flatMap { i =>
        val a = chain(i - 1); val b = chain(i)
        val dt = b.t - a.t
        if (dt > 0) Iterator.single(Interval(a.t, a.eventType, dt, a.cents))
        else Iterator.empty
      }
    }
  }

  /** Run the file-source stream to completion and return the daily
    * TWA report (same columns as the batch query).
    */
  def dailyReport(spark: SparkSession, sfDir: String): DataFrame =
    dailyReportMetered(spark, sfDir)._1

  /** [[dailyReport]] + per-batch [[StreamMetrics]] — the
    * transformWithState pipeline's state is ONE carried interval per
    * user (RocksDB ValueState), the custom-state analog of the
    * hash-agg pipelines' metered runners; StreamScaleSweep reads the
    * numRowsTotal decade from here.
    */
  def dailyReportMetered(spark: SparkSession, sfDir: String)
      : (DataFrame, Seq[StreamMetrics.BatchMetrics]) = {
    val s2 = Serving.stateSession(spark, rocksdb = true)
    import s2.implicits._
    val evs = Ingest.eventStream(s2, sfDir)
      // NULL-user guard (round-15 review): Ev.user is a primitive
      // Long — see Attribution; the shared oracle filters identically
      .filter(col("user_id").isNotNull)
      .select(col("user_id").as("user"),
        unix_timestamp(date_trunc("second", col("ts"))).as("t"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[Ev]
    val perDay = evs.groupByKey(_.user)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
      .toDF()
      .groupBy(expr("CAST(t DIV 86400 AS INT)").as("epochDay"),
        col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("total_secs"),
        sum(col("cents") * col("dt")).as("cd"))
    val name = s"stream_twa_${System.nanoTime()}"
    val q = perDay.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", graft.SparkEnv.scratchDir("graft-twa-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val report = s2.table(name)
      .select(date_from_unix_date(col("epochDay")).as("day"),
        col("event_type"), col("n_intervals"), col("total_secs"),
        round(col("cd").cast("double") / col("total_secs") / 100, 6)
          .as("twa_value"))
      .orderBy("day", "event_type")
    (report, StreamMetrics.history(q))
  }
}
