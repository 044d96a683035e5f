package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transforms (SURVEY.md §2 I1-I8): windowed aggregations,
  * watermarks, dedup, sessionization, arbitrary state. Each is written
  * against a plain DataFrame so the SAME function serves the streaming
  * query and its batch twin (stream-batch unification is the
  * correctness law the tests assert).
  */
object Windows {

  /** I1: tumbling hourly counters per event type. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** I2: sliding 24h window, hourly slide — rolling dashboard counts. */
  def sliding24h(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "24 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n_events"))

  /** I3: gap-based session windows (30 min) per user. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** I4: watermarked hourly agg — late rows beyond 1 h are dropped in
    * append mode (the reference had no late-data story at all).
    */
  def watermarkedHourly(events: DataFrame): DataFrame =
    tumblingHourly(events.withWatermark("ts", "1 hour"))

  /** I5: streaming dedup on event_id within the watermark horizon —
    * retried deliveries collapse to one row.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** I6 via the Spark 4 transformWithState API: per-key running count
    * with typed ValueState (requires the RocksDB state store
    * provider). The modern successor to flatMapGroupsWithState —
    * state survives across micro-batches and restarts.
    */
  class RunningCountProcessor[K]
      extends org.apache.spark.sql.streaming.StatefulProcessor[K, (K, Long), (K, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: K, rows: Iterator[(K, Long)],
        timerValues: TimerValues): Iterator[(K, Long)] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single((key, n))
    }
  }

  case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)
  case class Conversion(user_id: Long, click_ts_us: Long, purchase_ts_us: Long,
      latency_us: Long)

  /** I6: arbitrary stateful processing — per-user funnel state machine
    * (click → purchase conversion): emits one row per completed
    * conversion with the click→purchase latency.
    */
  def conversions(spark: SparkSession, events: Dataset[FunnelEvent]): Dataset[Conversion] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Conversion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[FunnelEvent], state: GroupState[Long]) =>
          // state = ts of the latest unconsumed click
          val out = scala.collection.mutable.ListBuffer[Conversion]()
          it.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
            e.event_type match {
              case "click" => state.update(e.ts_us)
              case "purchase" if state.exists =>
                val c = state.get
                if (e.ts_us >= c) {
                  out += Conversion(userId, c, e.ts_us, e.ts_us - c)
                  state.remove()
                }
              case _ =>
            }
          }
          out.iterator
      }
  }
}
