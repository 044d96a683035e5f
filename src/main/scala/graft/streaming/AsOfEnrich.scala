package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming as-of enrichment (SURVEY.md §7.6.2): the temporal twin of
  * the batch [[graft.operators.AsOf]] operator. Facts stream in and
  * are enriched with the latest dimension version at-or-before their
  * event time — the reference's whole ingest pattern
  * (enrichment-at-event-time), expressed as Spark 4
  * `transformWithState` custom state.
  *
  * State design: per key, a time-ordered list of (right_time, payload)
  * dimension versions in typed `ListState`. Each left row binary-
  * searches the greatest version ≤ its time — identical semantics to
  * [[graft.plans.AsOfJoin]]'s forward merge, so a single-batch run
  * equals the batch operator row-for-row (asserted in StreamJoinSpec).
  *
  * Ordering contract (the streaming part that batch doesn't have): a
  * version must ARRIVE no later than the first fact that should see
  * it — the standard assumption of changelog enrichment (dimension
  * updates publish before facts at their effective time). Within one
  * micro-batch arrival order is irrelevant: rights are folded into
  * state before any left of that batch is matched, and lefts are
  * processed in time order.
  *
  * Scale: state per key is the key's version history, not the fact
  * stream — bounded by dimension churn. For unbounded-churn dims, pass
  * a TTL to bound the history list. TTL eviction is safe for
  * SUPERSEDED versions only (facts arriving in watermark order can
  * no longer match them) — but a key's LATEST version must survive
  * indefinitely, because as-of matches arbitrarily old versions when
  * no newer one exists (a slow-churn key would otherwise silently
  * stop enriching once its only version aged out — round-13 review).
  * The processor therefore keeps the newest version in a separate
  * non-TTL ValueState and falls back to it when the TTL'd list has
  * no match: per-key state stays bounded (TTL'd churn window + ONE
  * pinned row), and slow-churn keys stay correct forever.
  */
object AsOfEnrich {

  /** Tagged union of both streams: `isRight` marks dimension-version
    * rows; facts carry their payload through to the output.
    */
  case class In(key: Long, isRight: Boolean, t: Long, payload: Long)

  /** One enriched fact: the fact's (t, payload) plus the matched
    * version's (t, payload). Facts with no version at-or-before their
    * time emit nothing (inner as-of semantics, like the batch
    * operator).
    */
  case class Out(key: Long, lt: Long, lpayload: Long, rt: Long, rpayload: Long)

  class Processor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, In, Out] {
    @transient private var versions: ListState[(Long, Long)] = _
    @transient private var newest: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      versions = getHandle.getListState[(Long, Long)]("versions",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), ttl)
      // the key's newest version, pinned WITHOUT a TTL: the one row
      // that must outlive any eviction window (see class doc)
      newest = getHandle.getValueState[(Long, Long)]("newest",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      val (rights, lefts) = rows.toSeq.partition(_.isRight)
      val existing = versions.get().toSeq
      val merged =
        if (rights.isEmpty) existing.toArray
        else {
          // sorted + distinct keeps replayed/duplicate versions from
          // growing state; ties on t resolve to the greatest payload,
          // mirroring the batch operator's total right-sort tiebreak
          val m = (existing ++ rights.map(r => (r.t, r.payload)))
            .distinct.sorted.toArray
          versions.put(m)
          val cand = m.last
          if (!newest.exists() || Ordering[(Long, Long)].lt(newest.get(), cand))
            newest.update(cand)
          m
        }
      val pinned = if (newest.exists()) Some(newest.get()) else None
      lefts.sortBy(l => (l.t, l.payload)).iterator.flatMap { l =>
        resolve(merged, pinned, l.t)
          .map { case (rt, rp) => Out(key, l.t, l.payload, rt, rp) }
      }
    }
  }

  /** The match decision, factored pure so the TTL-eviction fallback is
    * hermetically testable (the Spark-side integration of
    * processing-time TTL hung in this environment's RocksDB checksum
    * checkpoint manager — thread-dumped round 13 — so the spec pins
    * THIS function's law instead of driving eviction end-to-end):
    * binary-search the LAST surviving version with rt <= lt (in the
    * (t, payload)-sorted array that is also the greatest payload among
    * rt ties, the batch operator's tiebreak), then fall back to the
    * pinned newest version. If pinned.t <= lt it IS the global
    * greatest at-or-before lt (nothing between it and lt can exist —
    * it is the newest overall); when both candidates exist, max() of
    * the two is exactly the batch operator's answer.
    */
  private[graft] def resolve(merged: Array[(Long, Long)],
      pinned: Option[(Long, Long)], lt: Long): Option[(Long, Long)] = {
    var lo = 0; var hi = merged.length - 1; var best = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (merged(mid)._1 <= lt) { best = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    val fromList = if (best < 0) None else Some(merged(best))
    val fromPin = pinned.filter(_._1 <= lt)
    (fromList ++ fromPin)
      .reduceOption((a, b) => Ordering[(Long, Long)].max(a, b))
  }

  /** Wire a tagged-union stream through the processor. Requires the
    * RocksDB state store provider (transformWithState contract).
    *
    * `ttl` bounds per-key version history for unbounded-churn
    * dimensions (the scaladoc's mitigation is actually reachable from
    * here): state TTL requires processing-time mode, so the time mode
    * switches with it — TTLConfig.NONE keeps TimeMode.None.
    */
  def enrich(spark: SparkSession, tagged: Dataset[In],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Out] = {
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    tagged.groupByKey(_.key)
      .transformWithState(new Processor(ttl), timeMode, OutputMode.Append())
  }
}
