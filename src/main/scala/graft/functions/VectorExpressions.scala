package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two ArrayType(FloatType) columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §4.3): the composable
  * alternative — `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` —
  * uses higher-order functions, which Spark evaluates *interpreted*
  * (no whole-stage codegen), allocating a lambda frame per element.
  * On the similarity-join hot path that made the dot product ~90 % of
  * query time. This expression generates a tight primitive loop
  * instead, stays inside WholeStageCodegen, and is an exact drop-in:
  * it accumulates left-to-right in double, the same IEEE sequence as
  * the HOF fold and as DuckDB's list_reduce twin, so oracle
  * hash-matches are unaffected.
  *
  * Null semantics: null if either array is null (matching the HOF
  * form). Mismatched lengths: the DIRECT `vec_dot` surface throws — a
  * dimension mismatch is a data error and the loud contract is
  * spec-pinned — while `nullOnMismatch = true` (used ONLY by
  * [[graft.plans.RewriteDotProduct]]) returns null instead, exactly
  * the HOF fold's zip_with-padding semantics. The flag is what lets
  * the rewrite evaluate each operand ONCE with no If(size=size) guard:
  * the earlier guard duplicated both operands per row on computed
  * arrays (round-13 review).
  */
case class DotProductF(left: Expression, right: Expression,
    nullOnMismatch: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    nullOnMismatch || left.nullable || right.nullable
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      if (nullOnMismatch) return null
      throw new IllegalArgumentException(
        s"$prettyName: mismatched vector lengths ${n} vs ${y.numElements()}")
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val mismatch =
        if (nullOnMismatch) s"${ev.isNull} = true;"
        else s"""throw new IllegalArgumentException("vec_dot: mismatched vector lengths");"""
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  $mismatch
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftshim.{toColumn, toExpression}

  /** Column-API entry point: exact IEEE-sequential dot product. */
  def vec_dot(a: Column, b: Column): Column =
    toColumn(DotProductF(toExpression(a), toExpression(b)))

  /** Register `vec_dot` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProductF(exprs(0), exprs(1)), "built-in")
}
