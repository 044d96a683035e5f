package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact element-wise vector sum over an `array<double>` column with
  * fixed-point decimal semantics (SURVEY.md §2 D9/K3): each element is
  * rounded to `scale` decimal places exactly as a `CAST(x AS
  * DECIMAL(18,scale))` would (java BigDecimal.valueOf = the canonical
  * Double.toString expansion, HALF_UP — the same semantics Spark's
  * double→decimal Cast applies), then summed as unscaled longs. Long
  * addition is the identical exact integer arithmetic a decimal SUM
  * performs, so the result matches the relational `sum(cast(...))`
  * form bit-for-bit (AggregatorSpec asserts it) — while the aggregate
  * buffer is one primitive array instead of 64 independent decimal
  * SUM slots.
  *
  * This is the centroid/running-mean shape a 100 TB embedding pipeline
  * aggregates constantly (per-label centroids, IVF cell means): one
  * ObjectHashAggregate pass, buffer O(dims), mergeable (partial
  * aggregation works — element-wise long add is associative and
  * commutative, and overflow is unreachable: |x| ≤ 10^10 · 10^scale
  * per row leaves ~10^8 rows of headroom per partition at scale=8).
  *
  * Output: `array<double>` of the per-dimension decimal sums, each
  * converted via BigDecimal(unscaled, scale).doubleValue — the same
  * conversion `CAST(decimal AS DOUBLE)` performs.
  */
class VecDecimalSumAggregator(dims: Int, scale: Int)
    extends Aggregator[Seq[Double], Array[Long], Seq[Double]] {

  require(dims > 0 && scale >= 0, s"vec_decimal_sum: bad dims=$dims scale=$scale")

  override def zero: Array[Long] = new Array[Long](dims)

  override def reduce(buf: Array[Long], v: Seq[Double]): Array[Long] = {
    if (v == null) return buf
    val n = math.min(dims, v.length)
    var i = 0
    while (i < n) {
      buf(i) += java.math.BigDecimal.valueOf(v(i))
        .setScale(scale, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dims) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Double] =
    buf.toSeq.map(l => java.math.BigDecimal.valueOf(l, scale).doubleValue())

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
