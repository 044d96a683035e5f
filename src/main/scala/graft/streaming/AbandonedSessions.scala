package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Event-time TIMERS through the judged gate (SURVEY §2 I6, round 12):
  * the one transformWithState mechanism the other stateful pipelines
  * (funnel, TWA, attribution, stream dedup) never needed — a session
  * that must be emitted when TIME passes, not when another event
  * arrives. Abandoned-cart detection is the canonical case: a user's
  * session closes 30 minutes (event time) after its last event, and
  * only then do we know whether it converted.
  *
  * Mechanics: per-user open-session state (ValueState); events extend
  * the session (strict `gap > 30 min` starts a new one — DuckDB's
  * interval comparison, the q_session_windows tie discipline); a
  * session superseded by a later event emits immediately (its
  * closedness is proven by data), while the OPEN tail session
  * registers an event-time timer at last_event + 30 min, re-registered
  * as the session extends, and is emitted by [[Processor.handleExpiredTimer]]
  * once the WATERMARK certifies no earlier event can arrive. With
  * watermark delay 0 and AvailableNow, the final no-data micro-batch
  * advances the watermark to the corpus max and fires every timer at
  * or below it — so the emitted set is exactly the sessions with
  * close time ≤ max(ts), which the batch oracle states as a WHERE
  * clause (the honest watermark cut: in-flight sessions are NOT
  * emitted, by either engine). All arithmetic runs in epoch
  * MICROseconds — the fixture's every row carries sub-second
  * precision, so truncating would move gap boundaries off the
  * oracle's.
  *
  * 100 TB shape: state is ONE open session per active user; timers
  * are per-key in the state store (RocksDB); the emitted relation is
  * sessions, aggregated map-side to the daily report.
  *
  * GATE PRECONDITIONS (the PortableVerdictProcessor discipline —
  * document the arrival-order assumption at the declared-query site):
  * (1) the declared gate drains the fixture in ONE AvailableNow
  * micro-batch (single-file fixture, no maxFilesPerTrigger knob), so
  * intra-batch sorting gives the oracle's global time order; a
  * multi-batch run with non-time-ordered file chunks can deliver an
  * event OLDER than a prior batch's watermark, which this processor
  * merges (min-correcting startT) but a delay-0 watermark job would
  * normally drop — the gate is therefore NOT batching-invariant and
  * is deliberately excluded from StreamBatchingInvarianceSpec.
  * (2) timers are registered at ms precision (Spark's timer/watermark
  * clock) while the oracle cut compares in µs; the two cuts agree
  * unless a session's close time lands in the same millisecond as
  * the corpus max but after it in µs — FixtureDriftSpec pins the
  * fixtures clear of that boundary.
  */
object AbandonedSessions {

  val GapMicros: Long = 30L * 60 * 1000000

  case class Ev(user: Long, t: Long, eventType: String)
  case class Sess(user: Long, startT: Long, lastT: Long, nEvents: Long,
      purchased: Boolean)

  class Processor extends StatefulProcessor[Long, Ev, Sess] {
    @transient private var open: ValueState[Sess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Sess]("open", Encoders.product[Sess],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def closeTimerMs(s: Sess): Long = (s.lastT + GapMicros) / 1000

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Sess] = {
      val batch = rows.toArray.sortBy(_.t)
      if (batch.isEmpty) return Iterator.empty
      var cur = if (open.exists()) open.get() else null
      if (cur != null) getHandle.deleteTimer(closeTimerMs(cur))
      val out = List.newBuilder[Sess]
      for (e <- batch) {
        if (cur == null) {
          cur = Sess(key, e.t, e.t, 1, e.eventType == "purchase")
        } else if (e.t - cur.lastT > GapMicros) {
          out += cur // superseded: closed by data, emit without a timer
          cur = Sess(key, e.t, e.t, 1, e.eventType == "purchase")
        } else {
          // min-correct startT too: within a batch the sort makes it
          // moot, but a cross-batch straggler that still lands inside
          // the gap must not leave the session's start at a later
          // event (round-12 review)
          cur = Sess(key, math.min(cur.startT, e.t), math.max(cur.lastT, e.t),
            cur.nEvents + 1, cur.purchased || e.eventType == "purchase")
        }
      }
      open.update(cur)
      getHandle.registerTimer(closeTimerMs(cur))
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Sess] = {
      if (!open.exists()) return Iterator.empty
      val cur = open.get()
      // only the CURRENT session's close timer may close it (a stale
      // timer that escaped deletion must be ignored)
      if (closeTimerMs(cur) != expired.getExpiryTimeInMs) return Iterator.empty
      open.clear()
      Iterator.single(cur)
    }
  }

  /** Run the stream to completion; return emitted sessions (one row
    * per watermark-certified closed session).
    */
  def closedSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Serving.stateSession(spark, rocksdb = true)
    import s2.implicits._
    val evs = Ingest.eventStream(s2, sfDir)
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").as("user"),
        unix_micros(col("ts")).as("t"),
        col("event_type").as("eventType"))
      .as[Ev]
    val sess = evs.groupByKey(_.user)
      .transformWithState(new Processor, TimeMode.EventTime(),
        OutputMode.Append())
      .toDF()
    val qname = s"stream_abandoned_${System.nanoTime()}"
    val q = sess.writeStream.format("memory").queryName(qname)
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkEnv.scratchDir("graft-abandoned-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s2.table(qname)
  }
}
