package graft.functions

/** The ONE implementation of the sorted-distinct-long buffer algebra
  * shared by the capped-set aggregators ([[KmvStateAggregator]],
  * [[BoundedDistinctAggregator]]) — round-14 review: the insert and
  * capped-merge loops existed twice in this package and had to stay
  * in lockstep by hand, the same duplication class the round-13
  * review extracted TriangularPairs for.
  *
  * Contracts: inputs to [[mergeCapped]] are sorted ASC and distinct;
  * the result is the sorted distinct union truncated to its `cap`
  * smallest elements. [[insertAt]] inserts a value known absent at a
  * position found by binarySearch.
  */
private[functions] object SortedLongs {

  /** Insert `v` (not present) at position `ins` of sorted `buf`. */
  def insertAt(buf: Array[Long], v: Long, ins: Int): Array[Long] = {
    val out = new Array[Long](buf.length + 1)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = v
    System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
    out
  }

  /** Merge two sorted distinct arrays, keep the `cap` smallest
    * distinct values — O(cap), never O(|a| + |b|) past the cap.
    */
  def mergeCapped(a: Array[Long], b: Array[Long], cap: Int): Array[Long] = {
    if (a.isEmpty) return if (b.length <= cap) b else java.util.Arrays.copyOf(b, cap)
    if (b.isEmpty) return if (a.length <= cap) a else java.util.Arrays.copyOf(a, cap)
    val out = new Array[Long](math.min(a.length + b.length, cap))
    var i = 0; var j = 0; var k = 0
    while (k < cap && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val x = b(j); j += 1; x }
        else if (j >= b.length) { val x = a(i); i += 1; x }
        else if (a(i) < b(j)) { val x = a(i); i += 1; x }
        else if (a(i) > b(j)) { val x = b(j); j += 1; x }
        else { val x = a(i); i += 1; j += 1; x } // equal: advance both
      out(k) = take; k += 1
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }
}
