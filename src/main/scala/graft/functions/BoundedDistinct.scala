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

/** Sorted-by-id buffer of the pair collector below: parallel arrays,
  * distinct on id, saturating at cap+1 entries (the same "exceeded"
  * sentinel contract as [[BoundedDistinctAggregator]]).
  */
final case class PairSetBuf(ids: Array[Long], ns: Array[Int])

/** [[BoundedDistinctAggregator]] for (id: long, n: int) payload pairs
  * (round-14 review): `containmentPairs` collected struct(doc_id, n)
  * per gram hash through a plain collect_set and applied its maxDf
  * ceiling as a post-hoc size() filter — exactly the hot-key blow-up
  * the long variant exists to prevent (a boilerplate gram shared by
  * millions of docs materializes a multi-GB aggregation buffer before
  * the filter can drop it). Distinct on `id`; `n` rides as payload
  * (functionally dependent on the doc id by contract — on a breach
  * the SMALLER n wins, a commutative/associative resolution, so
  * merges stay order-independent). Below the cap the collected set is
  * exact, so oracle gates are unchanged.
  */
class BoundedPairDistinctAggregator(cap: Int)
    extends Aggregator[(java.lang.Long, java.lang.Integer), PairSetBuf,
      Seq[(Long, Int)]] {

  require(cap > 0, s"bounded_pair_distinct: cap must be positive, got $cap")

  private val max = cap + 1 // cap+1 length = "exceeded" sentinel

  override def zero: PairSetBuf =
    PairSetBuf(Array.emptyLongArray, Array.emptyIntArray)

  override def reduce(buf: PairSetBuf,
      v: (java.lang.Long, java.lang.Integer)): PairSetBuf = {
    if (v == null || v._1 == null || v._2 == null ||
      buf.ids.length >= max) return buf
    val id = v._1.longValue
    val n = v._2.intValue
    val i = java.util.Arrays.binarySearch(buf.ids, id)
    if (i >= 0) {
      if (n < buf.ns(i)) {
        val ns2 = buf.ns.clone(); ns2(i) = n
        PairSetBuf(buf.ids, ns2)
      } else buf
    } else {
      val at = -(i + 1)
      val ids2 = SortedLongs.insertAt(buf.ids, id, at)
      val ns2 = new Array[Int](buf.ns.length + 1)
      System.arraycopy(buf.ns, 0, ns2, 0, at)
      ns2(at) = n
      System.arraycopy(buf.ns, at, ns2, at + 1, buf.ns.length - at)
      PairSetBuf(ids2, ns2)
    }
  }

  override def merge(a: PairSetBuf, b: PairSetBuf): PairSetBuf = {
    if (a.ids.isEmpty) return b
    if (b.ids.isEmpty) return a
    val cap2 = math.min(a.ids.length + b.ids.length, max)
    val ids = new Array[Long](cap2)
    val ns = new Array[Int](cap2)
    var i = 0; var j = 0; var k = 0
    while (k < max && (i < a.ids.length || j < b.ids.length)) {
      if (i >= a.ids.length) { ids(k) = b.ids(j); ns(k) = b.ns(j); j += 1 }
      else if (j >= b.ids.length) { ids(k) = a.ids(i); ns(k) = a.ns(i); i += 1 }
      else if (a.ids(i) < b.ids(j)) { ids(k) = a.ids(i); ns(k) = a.ns(i); i += 1 }
      else if (a.ids(i) > b.ids(j)) { ids(k) = b.ids(j); ns(k) = b.ns(j); j += 1 }
      else { // same id: payload contract, smaller n wins
        ids(k) = a.ids(i); ns(k) = math.min(a.ns(i), b.ns(j)); i += 1; j += 1
      }
      k += 1
    }
    if (k == cap2) PairSetBuf(ids, ns)
    else PairSetBuf(java.util.Arrays.copyOf(ids, k),
      java.util.Arrays.copyOf(ns, k))
  }

  override def finish(buf: PairSetBuf): Seq[(Long, Int)] =
    buf.ids.indices.map(i => (buf.ids(i), buf.ns(i)))

  override def bufferEncoder: Encoder[PairSetBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Int)]] = ExpressionEncoder()
}
