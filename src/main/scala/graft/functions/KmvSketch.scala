package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** K-minimum-values distinct-count sketch (SURVEY.md §2 D5/D9): the
  * mergeable sketch-state path for COUNT(DISTINCT) at 100 TB, where
  * exact expansion (and even per-executor exact sets) stop fitting.
  *
  * State = the k smallest xxhash64 values seen (treated as uniform on
  * [0, 2^64)). Estimator: (k-1) · 2^64 / (max of the k minima − MIN).
  * Relative error ≈ 1/√(k−2); k=1024 → ~3 %. Merging two sketches is
  * a k-way merge of the minima — associative and commutative, so
  * Spark's partial/final aggregation is exact over the sketch algebra
  * (the merge-law test asserts it).
  *
  * vs approx_count_distinct (HLL++): same role; this one exists to
  * exercise the custom-mergeable-state machinery (SURVEY §4.3) with
  * inspectable state, and because KMV sketches support set operations
  * (union here; intersection via inclusion-exclusion) that HLL
  * doesn't expose in Spark.
  */
abstract class KmvStateAggregator[OUT](k: Int)
    extends Aggregator[java.lang.Long, Array[Long], OUT] {

  require(k > 0, s"kmv_distinct: k must be positive, got $k")

  override def zero: Array[Long] = Array.empty

  /** Input is a pre-hashed value (xxhash64, shifted to unsigned
    * order); NULL input rows are skipped, matching COUNT(DISTINCT)
    * semantics (the column builder maps them to a null hash).
    */
  override def reduce(buf: Array[Long], hashed: java.lang.Long): Array[Long] = {
    if (hashed == null) return buf
    // flip sign bit: treats Long as unsigned for ordering
    val h = hashed.longValue() ^ Long.MinValue
    // one binary search per accepted value (round-13 review: the
    // duplicate check and the insertion previously each searched)
    if (buf.length < k) {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos < 0) SortedLongs.insertAt(buf, h, -pos - 1) else buf
    } else if (h < buf.last) {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos < 0) SortedLongs.insertAt(buf, h, -pos - 1).take(k) else buf
    } else buf
  }

  // sorted-distinct union keeping the k smallest (shared algebra,
  // round-14 review — was a near-verbatim twin of BoundedDistinct's)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    SortedLongs.mergeCapped(a, b, k)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** The production finisher: estimate n from the k-th minimum of
  * xxhash64 values, treated as uniform on [0, 2^64).
  */
class KmvSketchAggregator(k: Int) extends KmvStateAggregator[Long](k) {
  override def finish(buf: Array[Long]): Long = {
    if (buf.length < k) buf.length.toLong // exact below k
    else {
      // minima are uniform on [0, 2^64); kth min at ~ k/(n+1) of the
      // range. buf holds sign-flipped values: ascending == unsigned
      // ascending, so the offset from Long.MinValue IS the position.
      val frac = (buf.last.toDouble - Long.MinValue.toDouble) / math.pow(2, 64)
      math.round((k - 1) / frac)
    }
  }
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Sketch-STATE output for the oracle-portable declared query
  * (`q_kmv_distinct_users`): the merged sketch's distinct-hash count
  * and its k-th minimum as raw (un-flipped) hash values, with the
  * estimator applied OUTSIDE the aggregator as a Column expression
  * shared verbatim with the DuckDB oracle. Splitting state from
  * estimator is what makes the estimating regime value-gateable: both
  * engines evaluate the same short IEEE expression (one cast, one
  * exponent-shift division, one division, one round) on the same
  * integer, so the emitted estimate is bit-identical by construction
  * — the q_stats_funcs exact-moments discipline applied to a sketch.
  * kth = -1 below capacity (the exact regime; never consumed there).
  *
  * `cnt` is NOT an exact cardinality: the buffer is capped at k, so
  * cnt = min(distinct-hash count, k). The declared query's CASE
  * branches on `cnt < k` (exact regime) vs `cnt >= k` (estimating
  * regime), and the capped value and the true distinct count select
  * the SAME branch in every case — below capacity they are equal, at
  * or past capacity both are >= k — which is the only property the
  * gate consumes. Callers must not treat cnt as a distinct count.
  */
case class KmvKth(cnt: Long, kth: Long)

class KmvKthAggregator(k: Int) extends KmvStateAggregator[KmvKth](k) {
  override def finish(buf: Array[Long]): KmvKth =
    KmvKth(buf.length.toLong,
      if (buf.length < k) -1L else buf.last ^ Long.MinValue)
  override def outputEncoder: Encoder[KmvKth] = Encoders.product[KmvKth]
}

/** The raw sketch state (sorted sign-flipped minima) as a column —
  * what makes KMV's SET ALGEBRA expressible relationally: union is
  * the merge the Aggregator already performs; intersection of two
  * sketches is `array_intersect` of their state arrays (below
  * capacity the state IS the full hash set, so the intersection is
  * exact; past capacity, |A∩B∩minima(U)|/k · est(U) is the standard
  * estimator — both as plain Column expressions over this output).
  * This is the operation HLL cannot expose (registers lose identity),
  * the documented reason this sketch family exists.
  */
class KmvArrayAggregator(k: Int) extends KmvStateAggregator[Array[Long]](k) {
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object KmvSketch {
  /** Approximate COUNT(DISTINCT c) via a k-minimum-values sketch.
    * NULL rows do not count: Spark's xxhash64 maps a NULL argument to
    * the seed (42), which would enter the sketch as one phantom
    * distinct value — guard the hash behind isNotNull so NULL rows
    * carry a null hash, which the aggregator skips.
    */
  def kmv_distinct(c: Column, k: Int = 1024): Column = {
    import org.apache.spark.sql.functions.when
    udaf(new KmvSketchAggregator(k), Encoders.LONG)
      .apply(when(c.isNotNull, xxhash64(c)))
  }

  /** The sketch STATE (cnt, kth-min) over a caller-supplied pre-hashed
    * column — the oracle-portable path: the caller picks a hash both
    * engines can compute (the md5 fp60 family) and applies the
    * estimator as a shared Column expression. NULL hashes are skipped
    * by the aggregator (COUNT(DISTINCT) semantics).
    */
  def kmv_kth(hashed: Column, k: Int): Column =
    udaf(new KmvKthAggregator(k), Encoders.LONG).apply(hashed)

  /** The sketch's state array (sorted minima) for relational set
    * algebra — see [[KmvArrayAggregator]]. NULL rows skipped.
    */
  def kmv_state(c: Column, k: Int = 1024): Column = {
    import org.apache.spark.sql.functions.when
    udaf(new KmvArrayAggregator(k), Encoders.LONG)
      .apply(when(c.isNotNull, xxhash64(c)))
  }
}
