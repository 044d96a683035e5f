package graft

import graft.operators.Dedup
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** TokenNGrams generator: exact parity with the interpreted
  * `transform`/`slice`/`array_join` expression it replaced, edge
  * semantics (NULL / short text / empty tokens / Unicode), and
  * whole-stage-codegen membership.
  */
class TokenNGramsSpec extends SparkSpec {

  /** The round-1..3 expression form — the semantics reference. */
  private def oldShingleRows(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, greatest(size(toks) - $n, 0)), " +
            s"i -> array_join(slice(toks, i + 1, $n), ' '))")).as(Seq("pos", "shingle")))

  test("token_ngrams matches the old expression row-for-row on real docs") {
    val docs = Tables.documents(spark, sf)
    for (n <- Seq(2, 3, 5)) {
      val neu = Dedup.shingleRows(docs, n)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      val old = oldShingleRows(docs, n)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      assert(neu.length == old.length, s"n=$n row count")
      assert(neu.sameElements(old), s"n=$n rows differ")
    }
  }

  test("token_ngrams edge semantics: null, short, empty tokens, trailing space, unicode") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),          // 4 toks -> 2 trigrams
      (2L, "a b"),              // short -> whole text once
      (3L, null.asInstanceOf[String]), // -> no rows
      (4L, ""),                 // one empty token -> itself once
      (5L, "a  b"),             // double space -> empty middle token
      (6L, "a b "),             // trailing space -> trailing empty token
      (7L, "héllo wörld 😀 end") // multi-byte chars around the spaces
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), expr("token_ngrams(text, 3)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toList.sorted
    assert(got == List(
      (1L, 0, "a b c"), (1L, 1, "b c d"),
      (2L, 0, "a b"),
      (4L, 0, ""),
      (5L, 0, "a  b"),          // 3 toks ("a","","b") -> 1 trigram = original
      (6L, 0, "a b "),          // 3 toks ("a","b","") -> 1 trigram = original
      (7L, 0, "héllo wörld 😀"), (7L, 1, "wörld 😀 end")), got)
    // parity with Spark's own split-with-empties semantics — EXCEPT
    // the old form's spurious (pos=0, shingle=NULL) row per NULL-text
    // doc (greatest() skips NULLs, so sequence(0,0) survives and
    // array_join(slice(NULL,…)) yields NULL); the generator emits no
    // rows for NULL text, matching explode-of-NULL and inner-join-
    // on-key semantics (the same fix char_ngrams made in round 3)
    val oldGot = oldShingleRows(df, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toList.filter(_._3 != null).sorted
    assert(got == oldGot, s"old form disagrees: $oldGot")
  }

  test("token_ngrams matches the old expression on seeded random text") {
    import spark.implicits._
    // adversarial alphabet: multi-byte chars, runs of spaces (empty
    // tokens), leading/trailing spaces, single chars
    val rnd = new scala.util.Random(7)
    val pieces = Array("a", "bb", "é", "😀", "wörld", "", " ")
    val texts = (1L to 300L).map { id =>
      val s = Seq.fill(rnd.nextInt(12))(pieces(rnd.nextInt(pieces.length)))
        .mkString(rnd.nextInt(3) match { case 0 => " "; case 1 => "  "; case _ => " " })
      (id, s)
    }
    val df = texts.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val neu = df.select(col("doc_id"), expr(s"token_ngrams(text, $n)"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      val old = oldShingleRows(df, n)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .filter(_._3 != null).sorted
      assert(neu.sameElements(old), s"n=$n mismatch")
    }
  }

  test("token_ngram_stats equals the relational groupBy counts on real docs") {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    val docs = Tables.documents(spark, sf)
    val viaExpr = docs.select(col("doc_id"),
      toColumn(graft.functions.TokenNGramStats(toExpression(col("text")), 3)).as("st"))
      .select(col("doc_id"), col("st.n_grams"), col("st.n_top"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaRel = Dedup.shingleRows(docs)
      .groupBy("doc_id", "shingle").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_trigrams"), max("n").as("n_top"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaExpr == viaRel)
  }

  test("token_ngrams generator runs inside whole-stage codegen") {
    val df = Dedup.shingleRows(Tables.documents(spark, sf))
      .groupBy("shingle").count().orderBy(desc("count")).limit(5)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = finalPlan.toString
    assert("""\*\(\d+\) Generate tokenngrams""".r.findFirstIn(s).isDefined,
      s"expected codegen'd Generate:\n$s")
  }
}
