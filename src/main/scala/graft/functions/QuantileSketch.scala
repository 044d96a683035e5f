package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable multi-level quantile sketch (SURVEY.md §2 D8/J2): the
  * bounded-state path for percentiles at 100 TB, where exact
  * `percentile` sorts the group and even `approx_percentile`'s
  * QuantileSummaries state grows with log(n)·1/ε. This is the classic
  * Munro–Paterson / Manku-style multi-level sampler with DETERMINISTIC
  * alternating compaction (the randomized choice in KLL only tightens
  * constants): level l holds ≤ 2k values each standing for 2^l inputs;
  * a full level sorts, keeps alternate elements (parity by level, so
  * the bias alternates), and promotes them — so state is
  * O(k · log(n/k)) regardless of group size, and `merge` is
  * levelwise concatenation + the same compaction, making the sketch
  * algebra associative up to its rank-error bound.
  *
  * Rank error: each compaction at level l perturbs an element's rank
  * by ≤ 2^l, and level l compacts at most n/(k·2^l) times, giving the
  * standard Σ ≈ log²(n/k)·n/k worst-case drift — in practice ≪ n/k
  * (the spec pins an empirical 2 % rank bound at k=256 over the
  * fixture distributions, and exactness below 2k inputs is
  * structural: level 0 never fills, finish reads a plain sort).
  *
  * Results are order-DEPENDENT within the error bound (which inputs
  * share a compaction depends on arrival order), so queries over it
  * are spec-gated with rank-error assertions, not value-hashed —
  * same policy as approx_percentile/HLL.
  */
class QuantileSketchAggregator(k: Int, qs: Array[Double])
    extends Aggregator[java.lang.Double, Array[Array[Double]], Array[Double]] {

  require(k >= 8, s"quantile_sketch: k must be >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "quantile_sketch: quantiles must be in [0, 1]")

  /** levels(l) = unsorted buffer of values with weight 2^l. */
  override def zero: Array[Array[Double]] = Array(Array.empty[Double])

  override def reduce(levels: Array[Array[Double]],
      v: java.lang.Double): Array[Array[Double]] = {
    if (v == null) return levels
    val out = levels.clone()
    out(0) = out(0) :+ v.doubleValue()
    compact(out)
  }

  override def merge(a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] = {
    val out = new Array[Array[Double]](math.max(a.length, b.length))
    var l = 0
    while (l < out.length) {
      val av = if (l < a.length) a(l) else Array.empty[Double]
      val bv = if (l < b.length) b(l) else Array.empty[Double]
      out(l) = av ++ bv
      l += 1
    }
    compact(out)
  }

  /** Promote any level over 2k: sort, keep alternate elements (parity
    * by level), append survivors to level+1; cascade upward.
    */
  private def compact(levels: Array[Array[Double]]): Array[Array[Double]] = {
    var ls = levels
    var l = 0
    while (l < ls.length) {
      if (ls(l).length >= 2 * k) {
        val sorted = ls(l).sorted
        if (l + 1 >= ls.length) ls = ls :+ Array.empty[Double]
        // keep every other element; 2^l-weighted survivors promote
        val keep = new Array[Double](sorted.length / 2)
        var i = l % 2 // alternate start parity per level to debias
        var n = 0
        while (n < keep.length && i < sorted.length) {
          keep(n) = sorted(i); n += 1; i += 2
        }
        ls(l + 1) = ls(l + 1) ++ keep.take(n)
        ls(l) = sorted.takeRight(sorted.length - 2 * (sorted.length / 2))
      }
      l += 1
    }
    ls
  }

  /** Weighted nearest-rank quantiles over the (value, 2^level) pairs. */
  override def finish(levels: Array[Array[Double]]): Array[Double] = {
    val weighted = levels.iterator.zipWithIndex.flatMap { case (vs, l) =>
      val w = 1L << l
      vs.iterator.map(v => (v, w))
    }.toArray.sortBy(_._1)
    if (weighted.isEmpty) return Array.empty[Double]
    val total = weighted.iterator.map(_._2).sum
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var acc = 0L
      var i = 0
      var res = weighted.last._1
      var found = false
      while (i < weighted.length && !found) {
        acc += weighted(i)._2
        if (acc >= target) { res = weighted(i)._1; found = true }
        i += 1
      }
      res
    }
  }

  override def bufferEncoder: Encoder[Array[Array[Double]]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

object QuantileSketch {
  /** `quantile_sketch(c, qs, k)` → ARRAY<DOUBLE>: mergeable
    * approximate quantiles of `c` at ranks `qs`. NULL rows skipped,
    * matching `percentile` semantics.
    */
  def quantile_sketch(c: Column, qs: Seq[Double], k: Int = 256): Column =
    udaf(new QuantileSketchAggregator(k, qs.toArray), Encoders.DOUBLE)
      .apply(c)
}
