package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd sign-bit LSH bucket id: one traversal of the embedding
  * computes ALL hyperplane dot products and packs their sign bits into
  * a long — the fused form of `Σ_i CASE WHEN vec_dot(emb, plane_i) >= 0
  * THEN 1<<i ELSE 0 END`, which re-reads the 64-float array once per
  * plane. Bucket assignment is a full-corpus scan at 100 TB (every
  * LSH-bucketed op starts with it), so the fusion cuts the scan's
  * array traffic ×nPlanes — the same reasoning as `minhash_sig` /
  * `winnow_fps`.
  *
  * Bit-parity with the composed form (VectorExprSpec asserts on
  * fixtures + randomized shapes): each plane's accumulator receives
  * `(double)emb[j] * (double)plane_f[j]` in ascending-j order — the
  * identical IEEE sequence as `DotProductF` against a float-literal
  * plane array, so every sign decision (and therefore every bucket,
  * edge, and oracle hash downstream) is unchanged.
  *
  * Null semantics: null in → null out (standard unary). The composed
  * `when(...).otherwise(0)` form mapped a NULL embedding to bucket 0;
  * [[graft.operators.Similarity.bucketCol]] restores that with a
  * `coalesce(..., 0L)` so declared-query semantics are identical.
  * Length must equal the planes' dimension, like `vec_dot`'s
  * equal-length requirement.
  */
case class SignBucket(child: Expression,
    planes: IndexedSeq[IndexedSeq[Float]]) extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63, "sign_bucket: 1..63 planes")
  require(planes.map(_.size).distinct.size == 1,
    "sign_bucket: planes must share one dimension")

  private val dim = planes.head.size

  @transient private lazy val planeArr: Array[Array[Float]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(n == dim, s"$prettyName: vector length $n != plane dim $dim")
    val nP = planeArr.length
    val acc = new Array[Double](nP)
    var j = 0
    while (j < n) {
      val e = a.getFloat(j).toDouble
      var i = 0
      while (i < nP) { acc(i) += e * planeArr(i)(j).toDouble; i += 1 }
      j += 1
    }
    var b = 0L
    var i = 0
    // !(x < 0): sets the bit for NaN too, matching the COMPOSED form's
    // Spark comparison (nanSafeCompareDoubles: NaN > any value, so
    // vec_dot(..) >= 0 is TRUE on NaN) — a primitive `>= 0.0` cleared
    // it and broke bit-parity on dirty vectors (round-13 review);
    // -0.0 agrees in both forms (equal to 0.0)
    while (i < nP) { if (!(acc(i) < 0.0)) b |= (1L << i); i += 1 }
    b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planeArr, "float[][]")
      val n = ctx.freshName("n")
      val nP = ctx.freshName("nP")
      val acc = ctx.freshName("acc")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "sign_bucket: vector length " + $n + " != plane dim " + $dim);
         |}
         |final int $nP = $p.length;
         |final double[] $acc = new double[$nP];
         |for (int $j = 0; $j < $n; $j++) {
         |  final double $e = (double) $a.getFloat($j);
         |  for (int $i = 0; $i < $nP; $i++) {
         |    $acc[$i] += $e * ((double) $p[$i][$j]);
         |  }
         |}
         |long $b = 0L;
         |for (int $i = 0; $i < $nP; $i++) {
         |  // NaN-safe sign (see eval): !(x < 0) == Spark's x >= 0
         |  if (!($acc[$i] < 0.0)) $b |= (1L << $i);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBucket =
    copy(child = newChild)
}
