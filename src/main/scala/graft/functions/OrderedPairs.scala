package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructType}

/** Custom table-generating function (SURVEY.md §2 J4):
  * `ordered_pairs(ids)` over an array of `struct<id: long, n: int>`
  * emits one row `(id_a, id_b, lnf)` per unordered element pair with
  * `id_a < id_b` and `lnf = min(n_a, n_b)`. The generator sorts by id
  * internally (primitive-array insertion sort — bucket arrays are
  * capped at maxDf ≈ 64 elements), so callers need no `sort_array`,
  * which is a CodegenFallback expression that would break the
  * aggregation stage out of whole-stage codegen.
  *
  * This is the bucket→pairs step of every LSH-bucketed dedup pipeline
  * (passage overlap, near-dup candidates): docs sharing a bucket key
  * pair up, and each pair carries the smaller of the two docs' element
  * counts so the downstream overlap fraction needs no join back to a
  * per-doc table.
  *
  * Why not the SQL-combinator form
  * `explode(flatten(transform(sequence(...), i -> transform(slice(...),
  * ...))))` (the round-5 shape)? Three reasons, all measured on
  * q_passage_overlap at sf0.1:
  *
  *  1. Higher-order functions are interpreted (no doGenCode) — every
  *     bucket paid lambda-eval per element on top of the real work.
  *  2. The nested transform materializes the FULL pair array per
  *     bucket (O(B²) structs held at once, flattened, then exploded);
  *     the generator yields pairs one at a time through GenerateExec's
  *     iterator — peak memory O(B) per bucket.
  *  3. It emits `lnf` pre-reduced, so the consumer groups by the
  *     narrow (id_a, id_b) key instead of dragging both docs' counts
  *     through the shuffle as grouping columns.
  *
  * NULL array → no rows (same convention as [[CharNGrams]]); NULL
  * elements are skipped (cannot occur from collect_list, which drops
  * nulls, but the generator must not NPE on hand-built arrays).
  * Duplicate ids collapse to one element, keeping the MIN n (same
  * defense class: collect_set of structs could carry one id twice
  * with different counts, and an un-deduped run would emit a
  * contract-violating self-pair id_a == id_b — round-13 review).
  * Registered as SQL `ordered_pairs` via [[graft.GraftExtensions]].
  */
final case class OrderedPairs(ids: Expression) extends Generator {

  override def children: Seq[Expression] = Seq(ids)

  override def elementSchema: StructType = new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
    .add("lnf", IntegerType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = ids.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == LongType &&
          s(1).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_pairs expects array<struct<id: bigint, n: int>>, got ${other.sql}")
  }

  /** Pair iterator, shared by interpreted eval and generated code
    * (called through an `addReferenceObj` handle). Never returns null:
    * GenerateExec's codegen template calls `.iterator()` unchecked.
    */
  def pairs(arr: ArrayData): Iterator[InternalRow] = {
    if (arr == null) Iterator.empty
    else {
      val m = arr.numElements()
      // one unpacking pass: primitive arrays, no per-pair struct reads
      val id = new Array[Long](m)
      val nf = new Array[Int](m)
      var k = 0
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          val s = arr.getStruct(i, 2)
          // null FIELDS are skipped like null elements (round-14
          // review): getLong/getInt on a null slot silently read 0,
          // which would fabricate a phantom id-0 pair or a zero pair
          // floor — a hand-built array<struct> with a null id/n passes
          // checkInputDataTypes, so guard at read time
          if (!s.isNullAt(0) && !s.isNullAt(1)) {
            id(k) = s.getLong(0)
            nf(k) = s.getInt(1)
            k += 1
          }
        }
        i += 1
      }
      val n = k
      // joint insertion sort by id (n <= maxDf, tiny): pair emission
      // order and the id_a < id_b orientation are both id-order
      var p = 1
      while (p < n) {
        val idP = id(p); val nfP = nf(p)
        var q = p - 1
        while (q >= 0 && id(q) > idP) {
          id(q + 1) = id(q); nf(q + 1) = nf(q); q -= 1
        }
        id(q + 1) = idP; nf(q + 1) = nfP
        p += 1
      }
      // collapse adjacent duplicate ids (see class doc): keep MIN n,
      // the same reduction pair emission applies — a duplicate id
      // would otherwise self-pair
      var w = 0
      var s2 = 0
      while (s2 < n) {
        if (w > 0 && id(w - 1) == id(s2)) nf(w - 1) = math.min(nf(w - 1), nf(s2))
        else { id(w) = id(s2); nf(w) = nf(s2); w += 1 }
        s2 += 1
      }
      val nd = w
      new TriangularPairs(nd,
        (a, b) => InternalRow(id(a), id(b), math.min(nf(a), nf(b))))
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    pairs(ids.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsEv = ids.genCode(ctx)
    val ref = ctx.addReferenceObj("orderedPairs", this, classOf[OrderedPairs].getName)
    ev.copy(
      code = code"""
        ${idsEv.code}
        scala.collection.Iterator<InternalRow> ${ev.value} =
          $ref.pairs(${idsEv.isNull} ? null : ${idsEv.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OrderedPairs =
    copy(ids = newChildren(0))
}

/** Triangular (a < b) index-pair walk shared by the pair generators
  * (round-13 review: the stateful iterator existed verbatim in
  * ordered_pairs and mask_pairs). Empty for n < 2 by construction.
  */
private[functions] final class TriangularPairs(
    n: Int, emit: (Int, Int) => InternalRow) extends Iterator[InternalRow] {
  private var a = 0
  private var b = 1
  override def hasNext: Boolean = a < n - 1
  override def next(): InternalRow = {
    val r = emit(a, b)
    b += 1
    if (b == n) { a += 1; b = a + 1 }
    r
  }
}

/** `payload_pairs(array<struct<id: bigint, p: bigint>>)` →
  * (id_a, id_b, p_a, p_b): [[OrderedPairs]]' sibling for buckets whose
  * members carry a 64-bit PAYLOAD each side of the pair needs (the
  * simhash fingerprint — round-14 review: the simhash candidate
  * expansion was the last interpreted flatten/transform/slice site,
  * paying per-element lambda eval and materializing the full O(B²)
  * pair array per bucket where this generator streams pairs in O(B)
  * peak memory inside whole-stage codegen). Same contracts as
  * ordered_pairs: sorted ascending by id so id_a < id_b is free, null
  * elements/fields skipped, duplicate ids collapse (keeping the MIN
  * payload — id → payload is functional for every intended caller, so
  * the tie rule only pins determinism against contract breaches).
  * Registered as SQL `payload_pairs` via [[graft.GraftExtensions]].
  */
final case class PayloadPairs(ids: Expression) extends Generator {

  override def children: Seq[Expression] = Seq(ids)

  override def elementSchema: StructType = new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
    .add("p_a", LongType, nullable = false)
    .add("p_b", LongType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = ids.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == LongType &&
          s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"payload_pairs expects array<struct<id: bigint, p: bigint>>, got ${other.sql}")
  }

  /** Pair iterator, shared by interpreted eval and generated code. */
  def pairs(arr: ArrayData): Iterator[InternalRow] = {
    if (arr == null) Iterator.empty
    else {
      val m = arr.numElements()
      val id = new Array[Long](m)
      val pl = new Array[Long](m)
      var k = 0
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          val s = arr.getStruct(i, 2)
          if (!s.isNullAt(0) && !s.isNullAt(1)) {
            id(k) = s.getLong(0)
            pl(k) = s.getLong(1)
            k += 1
          }
        }
        i += 1
      }
      val n = k
      var p = 1
      while (p < n) {
        val idP = id(p); val plP = pl(p)
        var q = p - 1
        while (q >= 0 && id(q) > idP) {
          id(q + 1) = id(q); pl(q + 1) = pl(q); q -= 1
        }
        id(q + 1) = idP; pl(q + 1) = plP
        p += 1
      }
      var w = 0
      var s2 = 0
      while (s2 < n) {
        if (w > 0 && id(w - 1) == id(s2)) pl(w - 1) = math.min(pl(w - 1), pl(s2))
        else { id(w) = id(s2); pl(w) = pl(s2); w += 1 }
        s2 += 1
      }
      val nd = w
      new TriangularPairs(nd,
        (a, b) => InternalRow(id(a), id(b), pl(a), pl(b)))
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    pairs(ids.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsEv = ids.genCode(ctx)
    val ref = ctx.addReferenceObj("payloadPairs", this, classOf[PayloadPairs].getName)
    ev.copy(
      code = code"""
        ${idsEv.code}
        scala.collection.Iterator<InternalRow> ${ev.value} =
          $ref.pairs(${idsEv.isNull} ? null : ${idsEv.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PayloadPairs =
    copy(ids = newChildren(0))
}
