package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `MergePair(syms, left, right)` → the symbol array with every
  * non-overlapping left-to-right occurrence of the adjacent pair
  * (left, right) fused into one symbol `left+right` — one BPE merge
  * rule applied to one word ([[graft.operators.BpeTrain]]).
  *
  * Left-to-right non-overlapping is the standard BPE contract:
  * `[a, a, a]` under merge (a, a) → `[aa, a]`, never `[a, aa]` and
  * never a double-consume. The pair is fixed per expression instance
  * (training picks one winner per round), so the merged symbol is
  * precomputed once; per row the eval is a single scan with zero
  * allocations beyond the output array.
  *
  * Codegen: [[doGenCode]] routes through an `addReferenceObj` handle
  * (the [[MinHashSig]] pattern) so the projection stays inside
  * whole-stage codegen across the training loop's chained rounds.
  */
final case class MergePair(child: Expression, left: String, right: String)
    extends UnaryExpression {

  /** containsNull follows the INPUT (round-13 review): merge() copies
    * a null element through to the output (null equals neither pair
    * symbol), so declaring containsNull=false over a nullable-element
    * input would hand the optimizer a false no-null promise — wrong
    * IsNotNull pruning or NPEs downstream. The BPE trainer feeds
    * split()-produced arrays (containsNull=false), so its rounds keep
    * the tight type.
    */
  override def dataType: DataType = child.dataType match {
    case ArrayType(StringType, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = true) // pre-checkInput
  }
  override def prettyName: String = "merge_pair"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  @transient private lazy val l: UTF8String = UTF8String.fromString(left)
  @transient private lazy val r: UTF8String = UTF8String.fromString(right)
  @transient private lazy val lr: UTF8String =
    UTF8String.fromString(left + right)

  /** Shared by interpreted eval and generated code (addReferenceObj). */
  def merge(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    var k = 0
    while (i < n) {
      // isNullAt BEFORE getUTF8String (round-14 review): on
      // UnsafeArrayData the getter returns a zero-length string for a
      // null slot instead of null, which would silently corrupt a null
      // element to "" (and could fuse with a neighbor if a pair symbol
      // were empty) — the containsNull-propagation contract above
      // promises nulls copy THROUGH
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (cur != null && i + 1 < n && l.equals(cur) &&
        !arr.isNullAt(i + 1) && r.equals(arr.getUTF8String(i + 1))) {
        out(k) = lr
        i += 2 // consume both: non-overlapping left-to-right
      } else {
        out(k) = cur
        i += 1
      }
      k += 1
    }
    if (k == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], k))
  }

  override def nullSafeEval(a: Any): Any = merge(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mergePair", this, classOf[MergePair].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.merge($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)
}
