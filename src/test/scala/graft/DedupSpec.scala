package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** MinHash-LSH / SimHash / winnowing against the planted dup families
  * (FIXTURES.md: ~5 % of docs are near-dups sharing 40-char prefixes;
  * measured exact token-Jaccard of those pairs is ≥ 0.889).
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  /** Ground truth: exact 3-shingle Jaccard ≥ 0.5 over ALL pairs that
    * share at least one shingle (the shingle join IS the candidate
    * filter — unrelated docs share no 3-token shingle, measured
    * random-pair shingle-J ≤ 0.03, planted ≥ 0.889).
    */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val sh = Dedup.shingles(docs).withColumnRenamed("shingle", "elem")
    val cand = sh.select(col("doc_id").as("id_a"), col("elem"))
      .join(sh.select(col("doc_id").as("id_b"), col("elem")), Seq("elem"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    Dedup.shingleJaccard(docs, cand).filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("planted families exist (fixture sanity)") {
    assert(exactPairs.size >= 20)
  }

  test("minhash-LSH finds every planted high-Jaccard pair, no false positives") {
    val found = Dedup.minhashNearDups(docs, tau = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are verified with exact shingle Jaccard, so
    // found ⊆ truth is structural; found ⊇ truth is the probabilistic
    // part (P(miss) ≈ 4e-4 per pair at J≈0.89, b=8, r=4 —
    // deterministic seeds make this stable).
    assert(exactPairs.subsetOf(found),
      s"missed: ${exactPairs.diff(found)}")
    val extras = found.diff(exactPairs)
    assert(extras.isEmpty, s"false positives: $extras")
  }

  test("dedup is idempotent (dropDuplicates fixpoint)") {
    val once = docs.dropDuplicates("text")
    assert(once.count() == once.dropDuplicates("text").count())
  }

  test("simhash pairs are high-Jaccard pairs") {
    val sim = Dedup.simhashNearDups(docs, maxDist = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // shingle-simhash with small hamming distance is a *stricter*
    // near-dup notion; every simhash pair must be a true near-dup,
    // and it should catch a majority of the planted ones.
    assert(sim.subsetOf(exactPairs), s"non-near-dup simhash pairs: ${sim.diff(exactPairs)}")
    assert(sim.size >= exactPairs.size / 2,
      s"simhash found only ${sim.size} of ${exactPairs.size}")
  }

  test("winnowing: every planted pair shares fingerprints") {
    val fp = Dedup.winnowFingerprints(docs)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    exactPairs.foreach { case (a, b) =>
      val shared = byDoc(a).intersect(byDoc(b))
      assert(shared.nonEmpty, s"pair ($a,$b) shares no fingerprints")
    }
  }
}
