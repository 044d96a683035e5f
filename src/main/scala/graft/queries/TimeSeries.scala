package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.functions._

/** Reference-surface parity (SURVEY.md §2 D2/D3, §0.3): the reference
  * maintains per-(account, event_type) counters at every calendar
  * granularity (year/month/day/hour) eagerly in a KV store. Spark-first
  * re-expression: the same rollups as *declarative* aggregations —
  * Catalyst plans a partial (map-side) + final hash aggregate, so at
  * 100 TB each rollup is one shuffle of pre-combined partial counters,
  * not a per-event KV round-trip.
  */
object TimeSeries {

  /** D2/M0: hourly counters per event type — the reference's core
    * HINCRBY loop as one groupBy. `ts` is ns in parquet (µs in Spark):
    * date_trunc('hour') in BOTH engines sidesteps the precision gap.
    * Sum of `value` goes through DECIMAL(18,2) — exact and
    * order-independent (doubles in fixtures carry 2 decimals) — then
    * back to double so both engines emit the same schema.
    */
  val eventsHourly = DeclaredQuery(
    "q_events_hourly",
    """SELECT date_trunc('hour', ts) AS bucket, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("bucket", "event_type")
  }

  val all: Seq[DeclaredQuery] = Seq(eventsHourly)
}
