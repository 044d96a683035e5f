package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable sketch buffer: `levels(0)` is an AMORTIZED append buffer
  * (physical capacity ≥ logical fill `n0`, doubling up to the 2k
  * compaction threshold); `levels(1..)` are exact-length compaction
  * outputs. Round 8: the previous `Array[Array[Double]]` buffer
  * appended with `:+`, copying the whole level-0 array on EVERY row —
  * ~2 KB memcpy per input at k=256, which dominated
  * `q_sketch_percentiles` (0.78 s of pure copy at sf0.1). Amortized
  * append makes reduce O(1); the sketch VALUES are bit-identical
  * (same compaction algebra over the same logical content).
  */
case class SketchBuf(var levels: Array[Array[Double]], var n0: Int)

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
  * are spec-gated with rank-error assertions — EXCEPT in the
  * below-capacity exact regime, where the nearest-rank answer is a
  * pure function of the input set and `q_sketch_percentiles` /
  * `q_stream_value_percentiles` carry full value-hash oracles.
  */
class QuantileSketchAggregator(k: Int, qs: Array[Double])
    extends Aggregator[java.lang.Double, SketchBuf, Array[Double]] {

  require(k >= 8, s"quantile_sketch: k must be >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "quantile_sketch: quantiles must be in [0, 1]")

  private val cap = 2 * k

  override def zero: SketchBuf = SketchBuf(Array(Array.empty[Double]), 0)

  override def reduce(b: SketchBuf, v: java.lang.Double): SketchBuf = {
    if (v == null) return b
    val l0 = b.levels(0)
    if (b.n0 == l0.length)
      b.levels(0) = java.util.Arrays.copyOf(
        l0, math.min(math.max(8, l0.length * 2), cap))
    b.levels(0)(b.n0) = v.doubleValue()
    b.n0 += 1
    if (b.n0 >= cap) {
      b.levels(0) = java.util.Arrays.copyOf(b.levels(0), b.n0)
      b.levels = compact(b.levels)
      b.n0 = b.levels(0).length
    }
    b
  }

  /** Logical levels: level 0 trimmed to its fill. */
  private def trimmed(b: SketchBuf): Array[Array[Double]] = {
    val out = b.levels.clone()
    out(0) = java.util.Arrays.copyOf(out(0), b.n0)
    out
  }

  override def merge(a: SketchBuf, b: SketchBuf): SketchBuf = {
    val al = trimmed(a)
    val bl = trimmed(b)
    val out = new Array[Array[Double]](math.max(al.length, bl.length))
    var l = 0
    while (l < out.length) {
      val av = if (l < al.length) al(l) else Array.empty[Double]
      val bv = if (l < bl.length) bl(l) else Array.empty[Double]
      out(l) = av ++ bv
      l += 1
    }
    val c = compact(out)
    SketchBuf(c, c(0).length)
  }

  /** Promote any level over 2k: sort, keep alternate elements (parity
    * by level), append survivors to level+1; cascade upward. Operates
    * on exact-length (logical) arrays only.
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
  override def finish(b: SketchBuf): Array[Double] = {
    val weighted = trimmed(b).iterator.zipWithIndex.flatMap { case (vs, l) =>
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

  override def bufferEncoder: Encoder[SketchBuf] = ExpressionEncoder()
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
