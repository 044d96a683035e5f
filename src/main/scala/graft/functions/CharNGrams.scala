package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * Semantics (mirrors docTrigrams' padding rule): NULL text or n → no
  * rows; text shorter than n → the whole text once; otherwise
  * len-n+1 grams. Registered as SQL `char_ngrams` via
  * [[graft.GraftExtensions]].
  */
final case class CharNGrams(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType &&
      n.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "char_ngrams expects (text: STRING, n: INT literal)")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    val k0 = n.eval(input)
    if (t == null || k0 == null) Iterator.empty
    else {
      val s = t.asInstanceOf[UTF8String].toString
      val k = k0.asInstanceOf[Int]
      // Slice by CODE POINTS, not UTF-16 units: java substring would
      // split surrogate pairs, emitting malformed lone-surrogate
      // "grams" for any non-BMP character (emoji, CJK-B) and
      // diverging from codepoint-counting engines like the oracle.
      val cps = s.codePoints().toArray
      if (k <= 0) Iterator.empty
      else if (cps.length < k)
        Iterator.single(InternalRow(UTF8String.fromString(s)))
      else (0 to cps.length - k).iterator.map { i =>
        InternalRow(UTF8String.fromString(
          new String(cps, i, k)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharNGrams =
    copy(text = newChildren(0), n = newChildren(1))
}
