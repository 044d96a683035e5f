package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType, StringType, StructType}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** The collected stupid-backoff bigram LM, as binary-searchable
  * sorted arrays — the train-once artifact the stateless scorer
  * carries to executors (one copy per executor via the expression's
  * reference object, like [[BloomMightContain]]'s filter). Log-probs
  * are stored as DECIMAL(18,9) UNSCALED longs, so per-doc accumulation
  * is exact integer addition — bit-equal to the relational pipeline's
  * decimal sums regardless of traversal order. `biGrams`/`uniToks`
  * are sorted in UTF8String binary order (what
  * `java.util.Arrays.binarySearch` compares by).
  */
final case class LmArtifact(
    biGrams: Array[UTF8String], biLps: Array[Long],
    uniToks: Array[UTF8String], uniLps: Array[Long],
    floorLp: Long) {
  require(biGrams.length == biLps.length && uniToks.length == uniLps.length,
    "LmArtifact: parallel arrays must align")
}

/** `LmDocScore(text)` → STRUCT<n_trans: BIGINT, sum_lp: DECIMAL(38,9)>:
  * one zero-copy shingle pass scoring every bigram transition of the
  * document against a trained [[LmArtifact]] — bigram hit, else
  * backed-off unigram on the transition's second token, else the OOV
  * floor. No explode, no join, no state: the streaming/score-many
  * form of [[graft.operators.LanguageModel.docScores]], exactly equal
  * to it (integer adds of the same quantized values; spec-pinned).
  *
  * Tokenization matches [[TokenNGrams]] via the shared
  * [[ShingleCursor]]: single-space separators, empty tokens kept,
  * bigrams are contiguous byte ranges. Fewer than two tokens → zero
  * transitions (the generator's whole-text fallback is explicitly NOT
  * scored as a bigram). NULL text → NULL.
  */
final case class LmDocScore(child: Expression, model: LmArtifact)
    extends UnaryExpression {

  override def dataType: DataType = LmDocScore.schema
  override def prettyName: String = "lm_doc_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  /** Shared by interpreted eval and generated code (addReferenceObj). */
  def score(t: UTF8String): InternalRow = {
    // ONE cursor serves both widths (round-14 review: two cursors
    // scanned the text bytes four times; the space array is shared)
    val c = new ShingleCursor(t, 2)
    if (c.sizeWith(1) < 2) return InternalRow(0L, Decimal(0L, 38, 9))
    val nBi = c.size
    var sum = 0L
    var p = 0
    while (p < nBi) {
      val g = c.slice(p)
      val bIdx = java.util.Arrays.binarySearch(
        model.biGrams.asInstanceOf[Array[AnyRef]], g)
      if (bIdx >= 0) sum += model.biLps(bIdx)
      else {
        val w = c.sliceWith(p + 1, 1) // the transition's second token
        val uIdx = java.util.Arrays.binarySearch(
          model.uniToks.asInstanceOf[Array[AnyRef]], w)
        sum += (if (uIdx >= 0) model.uniLps(uIdx) else model.floorLp)
      }
      p += 1
    }
    InternalRow(nBi.toLong, Decimal(sum, 38, 9))
  }

  override def nullSafeEval(t: Any): Any = score(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmDocScore", this, classOf[LmDocScore].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.score($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): LmDocScore =
    copy(child = newChild)
}

object LmDocScore {
  val schema: StructType = new StructType()
    .add("n_trans", LongType, nullable = false)
    .add("sum_lp", DecimalType(38, 9), nullable = false)
}
