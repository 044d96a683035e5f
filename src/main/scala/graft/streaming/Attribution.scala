package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Streaming last-touch attribution — the real-time twin of
  * `q_attribution` (queries/WebAnalytics.scala), sharing its oracle
  * SQL: purchases are attributed to the same user's latest click
  * at-or-before them iff that click is ≤ 3600 s old, organic
  * purchases stay in the report (LEFT semantics, which is why this is
  * its own processor rather than a reuse of the inner-as-of
  * [[AsOfEnrich]]).
  *
  * State design: per user, the sorted distinct click seconds in typed
  * `ListState` — bounded by the user's click history, with the same
  * TTL escape hatch as AsOfEnrich if that ever grows unbounded.
  * Within a micro-batch, clicks fold into state BEFORE any purchase
  * of that batch is matched, and purchases are processed in time
  * order — so a single-batch run (Trigger.AvailableNow over the
  * fixture file) is row-identical to the batch union+window form.
  * Across batches the usual changelog contract applies: a click must
  * arrive no later than the first purchase that should see it.
  *
  * Money rides as exact CENTS (Long) through state and aggregation —
  * `round(value·100)` equals the batch form's DECIMAL(18,2) cast for
  * 2-decimal fixture values — and becomes a double only at the final
  * projection, keeping the streaming sum order-independent.
  */
object Attribution {

  case class In(user: Long, isClick: Boolean, t: Long, cents: Long)
  case class Out(epochDay: Int, attributed: Boolean, cents: Long)

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var clicks: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      clicks = getHandle.getListState[Long]("clicks", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      val (cs, ps) = rows.toSeq.partition(_.isClick)
      val existing = clicks.get().toSeq
      val merged =
        if (cs.isEmpty) existing.toArray
        else {
          val m = (existing ++ cs.map(_.t)).distinct.sorted.toArray
          clicks.put(m)
          m
        }
      ps.sortBy(_.t).iterator.map { p =>
        var lo = 0; var hi = merged.length - 1; var best = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (merged(mid) <= p.t) { best = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        val attributed = best >= 0 && p.t - merged(best) <= 3600L
        Out((p.t / 86400L).toInt, attributed, p.cents)
      }
    }
  }

  /** Run the file-source stream to completion and return the daily
    * attribution report (same columns as the batch query).
    */
  def dailyReport(spark: SparkSession, sfDir: String): DataFrame = {
    // cloned session via the shared bootstrap: transformWithState
    // needs the RocksDB provider, and state partition count is sized
    // to the stream, not the CPU count
    val s2 = Serving.stateSession(spark, rocksdb = true)
    import s2.implicits._
    val tagged = Ingest.eventStream(s2, sfDir)
      // NULL-user guard (round-15 review): In.user is a primitive
      // Long, so an unguarded null row would abort the stream with
      // "Null value appeared in non-nullable field"; the shared
      // oracle filters the same rows (WHERE user_id IS NOT NULL)
      .filter(col("user_id").isNotNull)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").as("user"),
        (col("event_type") === "click").as("isClick"),
        unix_timestamp(date_trunc("second", col("ts"))).as("t"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
      .as[In]
    val perDay = tagged.groupByKey(_.user)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
      .toDF()
      .groupBy("epochDay")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
        sum(when(col("attributed"), col("cents")).otherwise(0L)).as("rev_cents"))
    val name = s"stream_attribution_${System.nanoTime()}"
    val q = perDay.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", graft.SparkEnv.scratchDir("graft-attr-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(name)
      .select(date_from_unix_date(col("epochDay")).as("day"),
        col("n_purchases"), col("n_attributed"),
        (col("rev_cents") / 100.0).as("attributed_revenue"))
      .orderBy("day")
  }
}
