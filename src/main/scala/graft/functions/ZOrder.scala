package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder64(a, b)` → BIGINT: the Morton (Z-order) interleave of the
  * low 32 bits of two non-negative dimensions — the clustering key
  * behind multi-dimensional data skipping (Morton 1966; the layout
  * trick every lakehouse OPTIMIZE ZORDER BY implements). Sorting by
  * the interleaved key places rows close in BOTH dimensions into the
  * same parquet row groups, so min/max row-group stats prune scans
  * with a predicate on EITHER dimension — a plain sort clusters only
  * its leading column.
  *
  * Deliberately 2×32→64: the engine's z-order consumers (id × hour
  * bucket) fit 32 bits; values are masked to their low 32 so the
  * expression is total. Codegen'd: the classic
  * shift-mask bit-dilation, ~20 ops per dimension, no branches.
  */
final case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"${classOf[ZOrder64].getName.stripSuffix("$")}.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  /** Dilate the low 32 bits of `x` so bit i lands at position 2i. */
  def dilate(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** a's bits at even positions, b's at odd. */
  def interleave(a: Long, b: Long): Long =
    dilate(a) | (dilate(b) << 1)
}
