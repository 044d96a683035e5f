package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Custom table-generating function (SURVEY.md §2 J4, round 12):
  * `mask_pairs(mask)` over a LONG BITMASK emits one row `(a, b)` per
  * unordered pair of set bit positions with `a < b` — the pair
  * expansion of a bitset-encoded basket.
  *
  * This is [[OrderedPairs]] specialized to domains that fit one mask
  * word (≤ 64 values — brands, categories, event types): the consumer
  * aggregates the basket with `bit_or(1L << code)` — an 8-byte,
  * duplicate-idempotent, map-side-combinable state, so the DISTINCT
  * and the per-order set materialization both disappear — and this
  * generator streams the ≤ C(64,2) position pairs one at a time
  * through GenerateExec, codegen'd (no interpreted higher-order
  * function touches the data-sized stream). Bit positions are emitted
  * ascending, so `a < b` orientation is free, and when codes are
  * assigned by an order-preserving rank, position order ≡ attribute
  * order.
  *
  * NULL mask → no rows; masks with < 2 set bits → no rows.
  * Registered as SQL `mask_pairs` via [[graft.GraftExtensions]].
  */
final case class MaskPairs(mask: Expression) extends Generator {

  override def children: Seq[Expression] = Seq(mask)

  override def elementSchema: StructType = new StructType()
    .add("a", IntegerType, nullable = false)
    .add("b", IntegerType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = mask.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mask_pairs expects a BIGINT mask, got ${other.sql}")
  }

  /** Pair iterator, shared by interpreted eval and generated code.
    * Never returns null: GenerateExec's codegen template calls
    * `.iterator()` unchecked.
    */
  def pairs(m: java.lang.Long): Iterator[InternalRow] = {
    if (m == null || java.lang.Long.bitCount(m) < 2) Iterator.empty
    else {
      val mv = m.longValue()
      val n = java.lang.Long.bitCount(mv)
      val pos = new Array[Int](n)
      var k = 0
      var rest = mv
      while (rest != 0L) { // ascending: lowest set bit first
        pos(k) = java.lang.Long.numberOfTrailingZeros(rest)
        rest &= rest - 1
        k += 1
      }
      new TriangularPairs(n, (a, b) => InternalRow(pos(a), pos(b)))
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = mask.eval(input)
    pairs(if (v == null) null else java.lang.Long.valueOf(v.asInstanceOf[Long]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mEv = mask.genCode(ctx)
    val ref = ctx.addReferenceObj("maskPairs", this, classOf[MaskPairs].getName)
    ev.copy(
      code = code"""
        ${mEv.code}
        scala.collection.Iterator<InternalRow> ${ev.value} =
          $ref.pairs(${mEv.isNull} ? null : java.lang.Long.valueOf(${mEv.value}));
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MaskPairs =
    copy(mask = newChildren(0))
}
