package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization model parameters (SURVEY.md §2 K3): m
  * subspaces × ksub centroids × dsub dims. Codes are m bytes per
  * vector — a 64-dim float32 embedding (256 B) compresses 32× to an
  * 8-byte code, which is what lets a 100 TB embedding corpus's search
  * structure live in a fraction of the memory (the classic
  * Jégou/Douze/Schmid PQ design). Trained per-subspace with seeded
  * KMeans; carried into the expressions as a broadcast-style
  * reference object, like [[LangIdScore]]'s trigram model.
  */
final case class PqModel(
    m: Int, dsub: Int, ksub: Int,
    cents: Array[Array[Array[Float]]]) // [m][ksub][dsub]
  extends Serializable {
  require(ksub <= 256, "PQ codes are one byte per subspace")
  // shape consistency at CONSTRUCTION (round-14 review): an
  // inconsistent model would otherwise wrap byte codes silently
  // (cents(s).length > 256 → best.toByte aliases a different
  // centroid) or throw per-row AIOOBE at scoring time
  require(cents.length == m, s"PQ model: ${cents.length} codebooks != m=$m")
  // ≤ ksub, not ==: MLlib KMeans legitimately returns fewer centers
  // than k when the subspace has fewer distinct points; encode loops
  // over the realized length, which stays byte-safe under ksub ≤ 256
  require(cents.forall(cb => cb.nonEmpty && cb.length <= ksub),
    s"PQ model: every codebook must hold 1..$ksub centroids")
  require(cents.forall(_.forall(_.length == dsub)),
    s"PQ model: every centroid must have dsub=$dsub dims")

  /** Nearest-centroid code per subspace (squared L2). Returns null
    * for a vector of the wrong dimension — at corpus scale malformed
    * rows are data, not exceptions; NULL codes drop out of the ADC
    * ranking the same way NULL embeddings do.
    */
  def encode(v: ArrayData): Array[Byte] = {
    if (badVector(v)) return null
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cs = cents(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = v.getFloat(s * dsub + j) - cent(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Asymmetric distance: squared L2 between the raw query and the
    * candidate's reconstruction from its code. Wrong-dimension
    * queries and wrong-length codes yield NULL (boxed), mirroring
    * [[encode]]'s dirty-data posture.
    */
  def adcOrNull(codes: Array[Byte], q: ArrayData): java.lang.Double =
    if (codes.length != m || badVector(q)) null
    else java.lang.Double.valueOf(adc(codes, q))

  /** Malformed = wrong dimension OR any NULL element (getFloat on a
    * null slot would silently read 0.0 — parquet list elements are
    * nullable, so a dirty row must map to NULL, not a wrong code).
    */
  private def badVector(v: ArrayData): Boolean = {
    if (v.numElements() != m * dsub) return true
    var i = 0
    val n = v.numElements()
    while (i < n) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  private def adc(codes: Array[Byte], q: ArrayData): Double = {
    var d = 0.0
    var s = 0
    while (s < m) {
      val cent = cents(s)(codes(s) & 0xff)
      var j = 0
      while (j < dsub) {
        val t = q.getFloat(s * dsub + j) - cent(j)
        d += t * t
        j += 1
      }
      s += 1
    }
    d
  }
}

/** `PqEncode(embedding)` → BINARY (m bytes): quantize a float vector
  * to its PQ code. One codegen'd pass per row; the model rides an
  * `addReferenceObj` handle.
  */
final case class PqEncode(child: Expression, model: PqModel)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  // null also for wrong-dimension vectors, not just NULL input
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    model.encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    // encode() returns null for malformed vectors — propagate it into
    // ev.isNull, or codegen would hand a null byte[] to the row writer
    // with isNull=false (the interpreted path nulls correctly)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.encode($v); ${ev.isNull} = (${ev.value} == null);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `PqAdcDist(codes, query)` → DOUBLE: asymmetric squared-L2 distance
  * between a PQ code and a raw query vector.
  */
final case class PqAdcDist(left: Expression, right: Expression, model: PqModel)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dist"
  // null also for wrong-dimension inputs, not just NULL input
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, ARRAY<FLOAT>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(codes: Any, q: Any): Any =
    model.adcOrNull(codes.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    // freshName, not a hard-coded local: two pq_adc_dist calls in one
    // codegen scope (both children non-nullable -> no brace-scoped
    // null guard) would otherwise redefine the same variable and kick
    // the whole stage back to interpreted execution (round-13 review)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"""java.lang.Double $r = $ref.adcOrNull($c, $q);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDist =
    copy(left = newLeft, right = newRight)
}
