package graft

import graft.operators.SubstringDedup
import org.apache.spark.sql.functions._

/** ExactSubstr span detection + removal semantics on a hand-built
  * corpus where the right answers are computable by eye.
  */
class SubstringDedupSpec extends SparkSpec {

  // 8-token passage lifted verbatim into three docs; doc 3 is an
  // exact copy of doc 1; doc 4 shares nothing.
  private val passage = "p1 p2 p3 p4 p5 p6 p7 p8"
  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, s"a1 a2 $passage a3 a4 a5 a6 a7 a8"),
      (2L, s"b1 b2 b3 b4 b5 b6 b7 $passage b8"),
      (3L, s"a1 a2 $passage a3 a4 a5 a6 a7 a8"),
      (4L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (5L, "short doc")
    ).toDF("doc_id", "text")
  }

  test("detection finds the lifted passage in every doc carrying it") {
    val spans = SubstringDedup.dupSpans(corpus, 8, removableOnly = false)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    // docs 1 and 3 are whole-doc duplicates: every gram duplicated,
    // one island covering all 16 tokens
    assert(spans.filter(_._1 == 1L).toSeq == Seq((1L, 0, 16)))
    assert(spans.filter(_._1 == 3L).toSeq == Seq((3L, 0, 16)))
    // doc 2 shares only the passage: island = its 1 duplicated gram
    // at pos 7 → token range [7, 15)
    assert(spans.filter(_._1 == 2L).toSeq == Seq((2L, 7, 15)))
    // untouched and sub-8-token docs produce nothing
    assert(!spans.exists(s => s._1 == 4L || s._1 == 5L))
  }

  test("removal keeps the minimal-doc canonical occurrence") {
    val spans = SubstringDedup.dupSpans(corpus, 8, removableOnly = true)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    // doc 1 is keeper of every gram it shares → keeps everything
    assert(!spans.exists(_._1 == 1L))
    // doc 3 loses its whole text; doc 2 loses the passage span
    assert(spans.filter(_._1 == 3L).toSeq == Seq((3L, 0, 16)))
    assert(spans.filter(_._1 == 2L).toSeq == Seq((2L, 7, 15)))
  }

  test("rebuilt text cuts exactly the removable spans") {
    val got = SubstringDedup.qSubstringDedup.fn(spark, sf) // warms nothing; fixture run below
    val cleaned = {
      import spark.implicits._
      // run the declared pipeline body against the hand corpus via a
      // temp view shim: easier to re-derive with the public pieces
      val ranges = SubstringDedup.dupSpans(corpus, 8, removableOnly = true)
        .groupBy("doc_id")
        .agg(collect_list(struct(col("tok_start"), col("tok_end"))).as("ranges"))
      corpus.join(ranges, "doc_id")
        .select(col("doc_id"), split(col("text"), " ", -1).as("toks"), col("ranges"))
        .select(col("doc_id"),
          filter(transform(col("toks"), (t, i) => struct(t.as("tok"), i.as("pos"))),
            s => !exists(col("ranges"),
              r => s.getField("pos") >= r.getField("tok_start") &&
                s.getField("pos") < r.getField("tok_end"))).as("kept"))
        .select(col("doc_id"),
          array_join(transform(col("kept"), _.getField("tok")), " ").as("clean"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(cleaned.keySet == Set(2L, 3L))
    assert(cleaned(2L) == "b1 b2 b3 b4 b5 b6 b7 b8")
    assert(cleaned(3L) == "")
    // and the fixture-scale declared query stays internally consistent:
    // kept tokens never exceed the doc's token count
    val bad = got.join(Tables.documents(spark, sf), "doc_id")
      .filter(col("n_kept_tokens") > size(split(col("text"), " ", -1)))
      .count()
    assert(bad == 0L)
  }

  test("span profile is invariant under repartitioning") {
    val a = SubstringDedup.qSubstringSpans.fn(spark, sf).collect().toSeq
    val b = SubstringDedup.dupSpans(
        Tables.documents(spark, sf).repartition(7), 8, removableOnly = false)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("tok_end") - col("tok_start")).as("dup_tokens"),
        round(sum(col("tok_end") - col("tok_start")) /
          (max("n_tok") * lit(1.0)), 6).as("dup_fraction"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
