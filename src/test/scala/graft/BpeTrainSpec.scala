package graft

import graft.operators.BpeTrain
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: the distributed trainer against a
  * single-node reference implementation of the classic algorithm,
  * plus merge-application semantics and determinism.
  */
object BpeTrainSpec {

  /** Straight-line single-node BPE (Sennrich et al. 2016): word-freq
    * dict, count adjacent pairs, merge the argmax (count desc, then
    * lexicographic), repeat. The oracle for the distributed trainer.
    */
  def referenceBpe(words: Map[String, Long], numMerges: Int,
      minCount: Long = 2L): Seq[(String, String, Long)] = {
    var dict: Map[Vector[String], Long] = words.map { case (w, f) =>
      (w.map(_.toString).toVector :+ "</w>") -> f
    }
    val out = Vector.newBuilder[(String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minCount) done = true
        else {
          out += ((l, r, cnt))
          dict = dict.map { case (syms, f) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                merged += (l + r); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.result() -> f
          }.groupMapReduce(_._1)(_._2)(_ + _)
          rank += 1
        }
      }
    }
    out.result()
  }
}

class BpeTrainSpec extends SparkSpec {
  import BpeTrainSpec.referenceBpe
  import spark.implicits._

  test("merge_pair: left-to-right non-overlapping, pair fixed, empties preserved") {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    def apply1(syms: Seq[String], l: String, r: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("syms")
        .select(toColumn(graft.functions.MergePair(
          toExpression(col("syms")), l, r)).as("m"))
        .collect().head.getSeq[String](0)
    // the classic overlap case: aaa -> [aa, a], never [a, aa]
    assert(apply1(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(apply1(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // merged symbol can immediately re-pair only in a LATER round
    assert(apply1(Seq("x", "a", "b", "b"), "a", "b") == Seq("x", "ab", "b"))
    // no occurrence -> unchanged
    assert(apply1(Seq("q", "r"), "a", "b") == Seq("q", "r"))
    assert(apply1(Seq.empty[String], "a", "b") == Seq.empty[String])
  }

  test("hand-computed toy corpus learns the textbook merge sequence") {
    // 5x "low", 2x "lower": most frequent pair is (l,o) 7, then (lo,w) 7,
    // then (low,</w>) 5 -> the classic low/lower example
    val docs = Seq(
      (1L, "low low low", "en"), (2L, "low low lower", "en"),
      (3L, "lower", "en")).toDF("doc_id", "text", "lang")
    val got = BpeTrain.trainMerges(docs, 3)
      .map(m => (m.left, m.right, m.pair_count))
    val want = referenceBpe(Map("low" -> 5L, "lower" -> 2L), 3)
    assert(got == want, s"got $got want $want")
    assert(got.head == (("l", "o", 7L)))
  }

  test("fully-merged words stop contributing pairs instead of crashing the round") {
    // "ab" collapses to ONE symbol after 2 merges; asking for 4 must
    // terminate cleanly with exactly the 2 learnable merges (the ANSI
    // sequence(0,-1) regression: a descending sequence indexed [-1])
    val docs = Seq((1L, "ab ab ab", "en")).toDF("doc_id", "text", "lang")
    val got = BpeTrain.trainMerges(docs, 4)
      .map(m => (m.left, m.right, m.pair_count))
    val want = referenceBpe(Map("ab" -> 3L), 4)
    assert(got == want, s"got $got want $want")
    assert(got.size == 2, got.toString)
  }

  test("distributed trainer equals the single-node reference on the fixture corpus") {
    val docs = Tables.documents(spark, sf)
    val words = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(words, 16)
    val got = BpeTrain.trainMerges(docs, 16)
      .map(m => (m.left, m.right, m.pair_count))
    assert(got == want, s"first divergence: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.size == 16, s"fixture corpus should support 16 merges, got ${got.size}")
  }

  test("batched trainer reproduces the 1-per-round merge sequence exactly " +
      "(fixture corpus, toy corpora, and every batch size)") {
    val docs = Tables.documents(spark, sf)
    val want = BpeTrain.trainMerges(docs, 16)
    for (bs <- Seq(1, 2, 4, 16)) {
      val got = BpeTrain.trainMergesBatched(docs, 16, batchSize = bs)
      assert(got == want, s"batchSize=$bs: first divergence " +
        got.zip(want).find(p => p._1 != p._2))
    }
    // the adversarial SELF-PAIR shape (round-8 review finding): after
    // merging (a,a), runs of a's spawn (aa,aa) with count bounded only
    // by the accepted pair itself — here (a,a)=500 then (aa,aa)=200
    // outranks the disjoint (b,c)=150 a naive batch would also have
    // kept; the self-pair batch-stop must collapse that round to the
    // head merge alone
    val selfCorpus = Seq(
      (1L, Seq.fill(100)("aaaaaa").mkString(" "), "en"),
      (2L, Seq.fill(80)("bcx").mkString(" "), "en"),
      (3L, Seq.fill(70)("bcy").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val wantSelf = BpeTrain.trainMerges(selfCorpus, 8)
    for (bs <- Seq(2, 8)) {
      val gotSelf = BpeTrain.trainMergesBatched(selfCorpus, 8, batchSize = bs)
      assert(gotSelf == wantSelf,
        s"self-pair corpus bs=$bs: first divergence " +
          gotSelf.zip(wantSelf).find(p => p._1 != p._2) +
          s"\n got $gotSelf\nwant $wantSelf")
    }
    // randomized parity: multi-char words over a tiny alphabet with
    // heavy character repetition — the shapes that exercise self-pair
    // merges, created-pair ties, and the strict-dominance filter
    val rnd = new scala.util.Random(29)
    for (seed <- 1 to 3) {
      val words = (1 to 25).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => "ab".charAt(rnd.nextInt(2))).mkString
      }
      val text = rnd.shuffle(words.flatMap(w =>
        Seq.fill(1 + rnd.nextInt(9))(w))).mkString(" ")
      val corpus = Seq((seed.toLong, text, "en")).toDF("doc_id", "text", "lang")
      val want = BpeTrain.trainMerges(corpus, 10)
      val got = BpeTrain.trainMergesBatched(corpus, 10, batchSize = 4)
      assert(got == want, s"seed=$seed: first divergence " +
        got.zip(want).find(p => p._1 != p._2))
    }
    // and the empty / early-stop edges
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(BpeTrain.trainMergesBatched(empty, 4).isEmpty)
    val short = Seq((1L, "ab ab ab", "en")).toDF("doc_id", "text", "lang")
    assert(BpeTrain.trainMergesBatched(short, 4, batchSize = 4) ==
      BpeTrain.trainMerges(short, 4))
  }

  test("training is deterministic under repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = BpeTrain.trainMerges(docs, 8)
    val b = BpeTrain.trainMerges(docs.repartition(7, col("source")), 8)
    assert(a == b)
  }

  test("applyMerges segments greedily and losslessly") {
    val docs = Tables.documents(spark, sf)
    val merges = BpeTrain.trainMerges(docs, 12)
    assert(merges.nonEmpty)
    val words = BpeTrain.wordSymbols(docs)
    val seg = words.select(col("w"), col("syms"),
      BpeTrain.applyMerges(col("syms"), merges).as("bpe"))
    // lossless: concatenating the BPE units reproduces chars+marker
    val bad = seg.filter(
      concat_ws("", col("bpe")) =!= concat_ws("", col("syms"))).count()
    assert(bad == 0L, s"$bad words lost characters in segmentation")
    // compression: total units never increase, and strictly decrease
    // somewhere (16 learned merges must fire on their own corpus)
    val r = seg.agg(
      sum(size(col("syms"))).as("n0"), sum(size(col("bpe"))).as("n1")).head()
    assert(r.getLong(1) < r.getLong(0),
      s"merges did not compress: ${r.getLong(0)} -> ${r.getLong(1)}")
  }

  test("empty corpus trains an empty table, queries still run") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(BpeTrain.trainMerges(empty, 4).isEmpty)
  }
}
