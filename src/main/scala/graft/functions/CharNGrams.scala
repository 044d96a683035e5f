package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (SURVEY.md §2 J4 — a real custom
  * `Generator`, not a composition of built-ins): `char_ngrams(text, n)`
  * emits one row per character n-gram of `text`, lazily.
  *
  * Why not `explode(transform(sequence(...), ...))` (the round-1
  * form)? That shape materializes the FULL n-gram array per row
  * before the explode — ~len(text) n-char UTF8Strings (O(n·len)
  * bytes) held at once per document. The generator decodes the text
  * to a codepoint array once (O(len) ints) and yields grams one at a
  * time through GenerateExec's iterator, so peak per-row memory is
  * O(len) instead of O(n·len) — the difference between fine and OOM
  * when a "document" is a 100 MB crawl page at 100 TB scale.
  *
  * Codegen (round-4): the generator does NOT fall back — [[doGenCode]]
  * emits the gram iterator directly, so GenerateExec keeps the whole
  * stage inside one generated loop (GenerateExec's IterableOnce
  * template calls `.iterator()` on the produced value and consumes it
  * inline; a CodegenFallback generator would split the stage). The
  * produced iterator is never null — a NULL text yields the empty
  * iterator, which is also the semantics (NULL → no rows).
  *
  * Semantics (mirrors docTrigrams' padding rule): NULL text or n → no
  * rows; text shorter than n → the whole text once; otherwise
  * len-n+1 grams. Registered as SQL `char_ngrams` via
  * [[graft.GraftExtensions]].
  */
final case class CharNGrams(text: Expression, n: Expression)
    extends Generator {

  override def children: Seq[Expression] = Seq(text, n)

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType &&
      n.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "char_ngrams expects (text: STRING, n: INT literal)")

  // n is a foldable literal (enforced above) — evaluate once
  @transient private lazy val kVal: Int = n.eval() match {
    case null => -1
    case k => k.asInstanceOf[Int]
  }

  /** The lazy gram iterator, shared by interpreted eval and the
    * generated code (called through an `addReferenceObj` handle).
    * Never returns null: GenerateExec's codegen template invokes
    * `.iterator()` on it without a null check.
    *
    * Slices by CODE POINTS, not UTF-16 units: java substring would
    * split surrogate pairs, emitting malformed lone-surrogate "grams"
    * for any non-BMP character (emoji, CJK-B) and diverging from
    * codepoint-counting engines like the oracle.
    *
    * Round-4 rewrite: one byte scan records each code point's start
    * offset (UTF-8 first-byte lengths), and every gram is then a
    * ZERO-COPY byte-range view — no full `String` decode, no int[]
    * codepoint array, no per-gram re-encode (the old round-trip
    * tripled the per-row footprint on large docs; same
    * round-trip-free shape as TokenNGrams' ShingleCursor).
    */
  def grams(t: UTF8String): Iterator[InternalRow] = {
    if (t == null || kVal <= 0) Iterator.empty
    else {
      val bytes = t.getBytes
      val nb = bytes.length
      val offs = new scala.collection.mutable.ArrayBuilder.ofInt
      var i = 0
      while (i < nb) {
        offs += i
        i += UTF8String.numBytesForFirstByte(bytes(i))
      }
      val o = offs.result()
      val n = o.length // numChars
      if (n < kVal)
        Iterator.single(InternalRow(UTF8String.fromBytes(bytes, 0, nb)))
      else (0 to n - kVal).iterator.map { p =>
        val start = o(p)
        val end = if (p + kVal < n) o(p + kVal) else nb
        InternalRow(UTF8String.fromBytes(bytes, start, end - start))
      }
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    grams(text.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val textEv = text.genCode(ctx)
    val ref = ctx.addReferenceObj("charNGrams", this, classOf[CharNGrams].getName)
    ev.copy(
      code = code"""
        ${textEv.code}
        scala.collection.Iterator<InternalRow> ${ev.value} =
          $ref.grams(${textEv.isNull} ? null : ${textEv.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharNGrams =
    copy(text = newChildren(0), n = newChildren(1))
}
