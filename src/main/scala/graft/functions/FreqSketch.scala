package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries buffer: ≤ k (item, count) pairs in two fixed-capacity
  * arrays mutated IN PLACE (round-14 review — the previous immutable
  * Map buffer path-copied a HAMT on every input row and rebuilt the
  * whole map on every decrement pass, pure per-row allocation on the
  * web-scale streams this sketch exists for). `used` marks the live
  * prefix; dead slots are nulled so stale references never serialize.
  * Product-encodable, so the buffer still crosses shuffle/state-store
  * boundaries through the ordinary ExpressionEncoder.
  */
final case class MgBuf(items: Array[String], counts: Array[Long],
    var used: Int)

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; the
  * mergeable summary behind every "top pages this hour" dashboard
  * panel): bounded-state frequent-items counting — at most `k`
  * counters per group regardless of item cardinality.
  *
  * Algebra: counts are EXACT while a group's distinct items ≤ k (no
  * decrement ever fires) — deterministic, so queries in that regime
  * hash-gate against an exact SQL oracle. Past k, any item with true
  * frequency > n/(k+1) is guaranteed to survive with count
  * undercounted by at most n/(k+1) — the classic guarantee, and the
  * regime a web-scale page-view stream runs in. Merge is the
  * published mergeable-summaries rule (Agarwal et al. 2013): sum the
  * two maps; if over k entries, subtract the (k+1)-th largest count
  * from all and drop non-positives — associative within the same
  * error envelope, which is what lets Spark run it as partial
  * aggregates and the state store carry it across micro-batches.
  */
class MisraGriesAggregator(k: Int, topN: Int)
    extends Aggregator[String, MgBuf, Seq[(String, Long)]] {

  require(k > 0 && topN > 0 && topN <= k,
    s"misra_gries: need 0 < topN <= k, got k=$k topN=$topN")

  override def zero: MgBuf = MgBuf(new Array[String](k), new Array[Long](k), 0)

  override def reduce(m: MgBuf, item: String): MgBuf = {
    if (item == null) return m
    // linear probe: k is small by construction (8–64), and the scan is
    // allocation-free — cheaper than any hash structure at this size
    var i = 0
    while (i < m.used) {
      if (m.items(i) == item) { m.counts(i) += 1; return m }
      i += 1
    }
    if (m.used < k) {
      m.items(m.used) = item; m.counts(m.used) = 1L; m.used += 1
      m
    } else {
      // decrement-all in place; zeros compact out (the unseen item is
      // NOT inserted — the classic MG step)
      var w = 0; i = 0
      while (i < m.used) {
        if (m.counts(i) > 1) {
          m.items(w) = m.items(i); m.counts(w) = m.counts(i) - 1; w += 1
        }
        i += 1
      }
      var j = w
      while (j < m.used) { m.items(j) = null; m.counts(j) = 0L; j += 1 }
      m.used = w
      m
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (b.used == 0) return a
    if (a.used == 0) return b
    // exact sum over ≤ 2k entries (merges are rare next to rows — a
    // small transient map here is not the per-row path)
    val sum = new java.util.LinkedHashMap[String, java.lang.Long](2 * k)
    def add(item: String, c: Long): Unit = {
      val prev = sum.get(item)
      sum.put(item, if (prev == null) c else prev.longValue + c)
    }
    var i = 0
    while (i < a.used) { add(a.items(i), a.counts(i)); i += 1 }
    i = 0
    while (i < b.used) { add(b.items(i), b.counts(i)); i += 1 }
    var cut = 0L
    if (sum.size > k) {
      // the (k+1)-th largest count (0-indexed k after desc sort)
      val vals = new Array[Long](sum.size)
      val it0 = sum.values().iterator(); var n = 0
      while (it0.hasNext) { vals(n) = it0.next(); n += 1 }
      java.util.Arrays.sort(vals)
      cut = vals(vals.length - 1 - k)
    }
    var w = 0
    val it = sum.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue - cut
      if (c > 0) { a.items(w) = e.getKey; a.counts(w) = c; w += 1 }
    }
    var j = w
    while (j < k) { a.items(j) = null; a.counts(j) = 0L; j += 1 }
    a.used = w
    a
  }

  /** Top `topN` surviving items, count desc then item asc — a total
    * order, so the exact regime is value-stable.
    */
  override def finish(m: MgBuf): Seq[(String, Long)] =
    (0 until m.used).map(i => (m.items(i), m.counts(i)))
      .sortBy { case (i, c) => (-c, i) }.take(topN)

  override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

object FreqSketch {
  /** `top_items(c, topN, k)` → ARRAY<STRUCT<_1: item, _2: count>>:
    * bounded-state top-N frequent values of `c`.
    */
  def top_items(c: Column, topN: Int = 3, k: Int = 8): Column =
    udaf(new MisraGriesAggregator(k, topN), Encoders.STRING).apply(c)
}
