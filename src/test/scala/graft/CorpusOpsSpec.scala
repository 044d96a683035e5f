package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

/** Semantics pins for the CorpusOps family (containment, chunking,
  * epoch shuffle, token budget) — oracle parity is the driver's job;
  * these pin the hand-checkable invariants and the scale properties.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- containment ---------------------------------------------------

  test("containment: a doc lifted verbatim into a longer doc scores 1.0") {
    // doc 1 = 12 tokens, doc 2 = doc 1 + 12 fresh tokens; doc 3 unrelated.
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = a + " " + (13 to 24).map(i => s"w$i").mkString(" ")
    val c = (30 to 45).map(i => s"x$i").mkString(" ")
    Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .createOrReplaceTempView("corpus_containment")
    val docs = spark.table("corpus_containment")
    // run the declared pipeline over a temp dir-backed documents table
    val dir = java.nio.file.Files.createTempDirectory("corpusops").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.containmentPairs.fn(spark, dir)
      .select("id_a", "id_b", "containment").as[(Long, Long, Double)]
      .collect().map { case (x, y, v) => (x, y) -> v }.toMap
    // (1,2): every 5-gram of doc 1 appears in doc 2 → containment 1.0
    assert(out((1L, 2L)) == 1.0)
    // doc 3 shares nothing → no pair at all
    assert(!out.keySet.exists { case (x, y) => x == 3L || y == 3L })
  }

  test("containment pair orientation and uniqueness on the fixture corpus") {
    val base = CorpusOps.containmentPairs.fn(spark, sf).collect().toSeq
    // orientation invariant: every pair is emitted id_a < id_b exactly once
    val pairs = base.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.size == pairs.size)
    // fractions are well-formed: 0 < c <= 1, n_shared <= lnf
    base.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      val c = r.getDouble(4)
      assert(c > 0.0 && c <= 1.0)
    }
  }

  // --- chunking ------------------------------------------------------

  test("chunking: boundary cases n=W, n=W+1, n<W, coverage and overlap") {
    val W = 32; val S = 24
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("corpusops").toString
    Seq((1L, mk(10)), (2L, mk(32)), (3L, mk(33)), (4L, mk(80)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusOps.chunkDocuments.fn(spark, dir)
      .select("doc_id", "chunk_id", "tok_start", "n_chunk_tok", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // n<W and n=W → exactly one chunk covering the whole doc
    assert(byDoc(1L).map(r => (r._3, r._4)).toSeq == Seq((0L, 10L)))
    assert(byDoc(2L).map(r => (r._3, r._4)).toSeq == Seq((0L, 32L)))
    // n=W+1 → second chunk starts at S and is truncated
    assert(byDoc(3L).map(r => (r._3, r._4)).toSeq == Seq((0L, 32L), (24L, 9L)))
    // n=80 → 1+⌈48/24⌉=3 chunks at 0,24,48; chunk 48..79 reaches the
    // end exactly, so no 4th chunk; every token covered; W-S overlap
    assert(byDoc(4L).map(_._3).toSeq == Seq(0L, 24L, 48L))
    val covered = byDoc(4L).flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered == (0L until 80L).toSet)
    // chunk text round-trips the token slice
    val c1 = byDoc(4L)(1)
    assert(c1._5 == (25 to 56).map(i => s"t$i").mkString(" "))
  }

  test("chunking plan is map-only before the presentation sort") {
    val plan = CorpusOps.chunkDocuments.fn(spark, sf)
      .queryExecution.executedPlan.toString
    // one range exchange for the final ORDER BY; no hash exchange —
    // the chunker itself never shuffles
    assert(!plan.contains("hashpartitioning"), plan)
  }

  // --- epoch shuffle -------------------------------------------------

  test("epoch shuffle: deterministic, total, and balanced-ish") {
    val r1 = CorpusOps.corpusShuffle.fn(spark, sf).collect().toSeq
    val r2 = CorpusOps.corpusShuffle.fn(spark, sf).collect().toSeq
    assert(r1 == r2) // pure function of (seed, doc_id)
    val n = Tables.documents(spark, sf).count()
    assert(r1.size == n) // total: every doc placed exactly once
    // shard_pos is dense 1..k within each shard
    r1.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val pos = rows.map(_.getLong(1)).sorted
      assert(pos == (1L to pos.size).toSeq)
    }
    // 16 hex shards; no shard holds more than half the corpus
    assert(r1.map(_.getString(0)).distinct.forall("0123456789abcdef".map(_.toString).contains))
    assert(r1.groupBy(_.getString(0)).values.map(_.size).max <= n / 2)
  }

  // --- token budget --------------------------------------------------

  test("token budget shares sum to 1 and tokens reconcile with a direct count") {
    val rows = CorpusOps.tokenBudget.fn(spark, sf).collect()
    val shareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"share sum $shareSum")
    val total = rows.map(_.getLong(3)).sum
    val direct = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .agg(sum(size(split(col("text"), " ", -1)))).as[Long].head()
    assert(total == direct)
  }
}
