package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  require(k > 0 && topN > 0 && topN <= k,
    s"misra_gries: need 0 < topN <= k, got k=$k topN=$topN")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], item: String): Map[String, Long] = {
    if (item == null) return m
    m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < k => m.updated(item, 1L)
      case None => // decrement-all; zeros fall out
        m.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (i, c) =>
        if (c > cut) Some(i -> (c - cut)) else None
      }
    }
  }

  /** Top `topN` surviving items, count desc then item asc — a total
    * order, so the exact regime is value-stable.
    */
  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (i, c) => (-c, i) }.take(topN)

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

object FreqSketch {
  /** `top_items(c, topN, k)` → ARRAY<STRUCT<_1: item, _2: count>>:
    * bounded-state top-N frequent values of `c`.
    */
  def top_items(c: Column, topN: Int = 3, k: Int = 8): Column =
    udaf(new MisraGriesAggregator(k, topN), Encoders.STRING).apply(c)
}
