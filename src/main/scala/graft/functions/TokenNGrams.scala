package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-shingle twin of [[CharNGrams]] (SURVEY.md §2 J4/K2):
  * `token_ngrams(text, n)` emits one row per n-token shingle of the
  * space-separated `text`, with its 0-based position — the element
  * relation the dedup sketches (MinHash, SimHash, winnowing) consume.
  *
  * Replaces the round-1..3 form
  * `posexplode(transform(sequence(0, size(toks)-n), i ->
  * array_join(slice(toks, i+1, n), ' ')))`, which Spark evaluates
  * INTERPRETED (higher-order lambdas get no codegen) and which
  * materializes the full token array plus the full shingle array per
  * document before the explode. Two properties make the generator
  * strictly cheaper:
  *
  *  - Because the join separator equals the split separator (one
  *    space), every shingle is a CONTIGUOUS BYTE RANGE of the original
  *    text. One byte scan finds the space positions (0x20 never occurs
  *    inside a UTF-8 multi-byte sequence, so byte scanning is safe for
  *    any Unicode text); each gram is then a zero-copy
  *    `UTF8String.fromBytes(bytes, start, len)` view — no `String`
  *    decode, no per-token allocation, no shingle-array buffer.
  *  - `doGenCode` keeps GenerateExec inside the whole-stage-codegen
  *    span (same IterableOnce template as [[CharNGrams]]).
  *
  * Semantics match the old expression exactly: tokens are the
  * substrings between single spaces, keeping empty tokens (Spark's
  * `split(text, ' ')` with the default -1 limit, NOT java's
  * trailing-empty-dropping split); NULL text → no rows; fewer than n
  * tokens → the whole text once at pos 0; otherwise numToks-n+1
  * shingles. Duplicates are emitted (callers needing set semantics
  * aggregate downstream — the minhash `min` is duplicate-idempotent
  * and never needs to). `n ≤ 0` emits no rows rather than throwing —
  * DELIBERATE, matching `char_ngrams` (VectorExprSpec pins it); the
  * sketch expressions, which have no empty-output escape hatch, are
  * the ones that `require(n > 0)`.
  */
final case class TokenNGrams(text: Expression, n: Expression)
    extends Generator {

  override def children: Seq[Expression] = Seq(text, n)

  override def elementSchema: StructType =
    new StructType()
      .add("pos", IntegerType, nullable = false)
      .add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType &&
      n.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "token_ngrams expects (text: STRING, n: INT literal)")

  @transient private lazy val kVal: Int = n.eval() match {
    case null => -1
    case k => k.asInstanceOf[Int]
  }

  /** The lazy shingle iterator, shared by interpreted eval and the
    * generated code (via an `addReferenceObj` handle). Never returns
    * null — GenerateExec's codegen template calls `.iterator()` on it
    * unchecked.
    */
  def grams(t: UTF8String): Iterator[InternalRow] = {
    if (t == null || kVal <= 0) Iterator.empty
    else {
      // all boundary math lives in ShingleCursor — the single source
      // the sketch expressions also slice through
      val c = new ShingleCursor(t, kVal)
      (0 until c.size).iterator.map(p => InternalRow(p, c.slice(p)))
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    grams(text.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val textEv = text.genCode(ctx)
    val ref = ctx.addReferenceObj("tokenNGrams", this, classOf[TokenNGrams].getName)
    ev.copy(
      code = code"""
        ${textEv.code}
        scala.collection.Iterator<InternalRow> ${ev.value} =
          $ref.grams(${textEv.isNull} ? null : ${textEv.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenNGrams =
    copy(text = newChildren(0), n = newChildren(1))
}
