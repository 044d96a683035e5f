package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed mergeable top-k aggregator (SURVEY.md §2 D9/J2): keeps the k
  * largest doubles per group in a bounded buffer — the associative/
  * commutative shape that lets Spark run it partial+final across any
  * number of partitions (the property ScalaTest checks:
  * agg(a ++ b) == merge(agg(a), agg(b))). The reference's ZINCRBY
  * top-N leaderboards, as a first-class aggregate function.
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {

  require(k > 0, s"top_k: k must be positive, got $k")

  override def zero: Array[Double] = Array.empty

  override def reduce(buf: Array[Double], v: Double): Array[Double] =
    insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Double]): Array[Double] = buf

  /** Binary-search insertion into the descending buffer — O(k) per
    * accepted row, no re-sort (the KmvSketch insertSorted shape). NaN
    * is skipped entirely: total-order sorting would park it at the
    * tail where `v > buf.last` is false forever, freezing a full
    * buffer and breaking the merge law.
    */
  private def insert(buf: Array[Double], v: Double): Array[Double] = {
    if (v.isNaN) return buf
    if (buf.length >= k && !(v > buf.last)) return buf
    // first index with buf(i) < v (buffer is descending)
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) hi = mid else lo = mid + 1
    }
    val keep = if (buf.length < k) buf.length else k - 1
    val out = new Array[Double](keep + 1)
    System.arraycopy(buf, 0, out, 0, math.min(lo, keep))
    if (lo <= keep) {
      out(lo) = v
      System.arraycopy(buf, lo, out, lo + 1, keep - lo)
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column aggregate: array of the k largest values, descending.
    * NULL rows are skipped like every SQL aggregate (the primitive
    * input encoder would otherwise throw on a null): they map to NaN
    * before the aggregator, which `insert` ignores.
    */
  def top_k(c: Column, k: Int): Column =
    udaf(new TopKAggregator(k), Encoders.scalaDouble)
      .apply(org.apache.spark.sql.functions.coalesce(
        c, org.apache.spark.sql.functions.lit(Double.NaN)))
}
