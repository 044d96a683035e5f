package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** `collect_set` with a hard size ceiling (SURVEY.md §2 K8; round-5
  * verdict #2): collects DISTINCT long keys but stops growing at
  * `cap + 1` elements — the buffer can never exceed cap+1 longs no
  * matter how hot the group key is.
  *
  * This is the document-frequency guard a decontamination / passage
  * pipeline needs IN THE AGGREGATE, not after it: a boilerplate
  * 8-gram shared by millions of documents makes a plain
  * `collect_set(doc_id)` materialize a multi-GB row before any
  * post-hoc `size(...) <= maxDf` filter can drop it — the classic
  * skewed-key OOM. With the cap, a hot gram's buffer saturates at
  * cap+1 elements (a sentinel meaning "exceeded", which the caller
  * filters out); a surviving gram (≤ cap distinct docs) is collected
  * EXACTLY, so results below the ceiling are identical to collect_set
  * and stay oracle-checkable.
  *
  * Contract:
  *  - NULL inputs are skipped (collect_set semantics).
  *  - output is sorted ascending (deterministic).
  *  - `length > cap` ⇔ the group exceeded the ceiling; its retained
  *    elements are then an arbitrary subset and must be dropped, not
  *    interpreted.
  *
  * Buffer is a sorted distinct Array[Long]; insert/merge are O(cap)
  * — constant per row at the caps this engine uses (≤ a few hundred),
  * and mergeable (capped union is associative up to the over-cap
  * sentinel, which only ever maps to "dropped").
  */
class BoundedDistinctAggregator(cap: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {

  require(cap > 0, s"bounded_distinct: cap must be positive, got $cap")

  private val max = cap + 1 // cap+1 length = "exceeded" sentinel

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: java.lang.Long): Array[Long] = {
    if (v == null || buf.length >= max) return buf
    val x = v.longValue
    val i = java.util.Arrays.binarySearch(buf, x)
    if (i >= 0) buf else SortedLongs.insertAt(buf, x, -(i + 1))
  }

  // capped sorted-distinct union (shared algebra, round-14 review) —
  // a hot key's merge cost stays O(cap), not O(group size)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    SortedLongs.mergeCapped(a, b, max)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
