package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpression}

/** Streaming benchmark decontamination — the third leg of the ingest
  * trio (quality gate → near-dup gate → contamination gate): flag
  * arriving training documents that share an 8-gram with a benchmark
  * eval set, BEFORE they enter the corpus, so eval integrity never
  * depends on a later batch sweep.
  *
  * Scale shape: the asymmetry is the whole design. The train stream
  * is unbounded (100 TB), but benchmark eval sets are small BY
  * CONSTRUCTION — their distinct 8-gram fingerprints fit in a few MB
  * (8 bytes each), so the artifact side collects once
  * ([[benchGramHashes]], cached per corpus like the DSIR ratio model
  * and the IVF/PQ relations) and the stream side is a PURE PROJECTION:
  * one codegen'd [[graft.functions.GramSetHits]] pass per row
  * (shingle → xxhash64 → binary search), no explode, no join, no
  * state store, append mode. 0 hits ⇒ provably clean (binary-search
  * membership has no false negatives; a 64-bit fingerprint collision
  * can only over-flag — odds ~1e-10 at graded scale, the
  * q_decontaminate analysis). Swap the sorted array for the Bloom +
  * exact-verify pair of `incrementalExactDups` only if eval sets ever
  * outgrow executor memory — same plan shape either way.
  */
object StreamDecontaminate {

  /** Distinct benchmark n-gram fingerprints, sorted for binary
    * search — the train-once artifact. Uses the SAME shingle relation
    * (`token_ngrams` → `xxhash64(shingle)`, whole-text-once for short
    * docs) as the batch decontamination pipeline, so batch and stream
    * agree on what a gram is.
    */
  def benchGramHashes(bench: DataFrame, n: Int = 8): Array[Long] = {
    val hs = graft.operators.Dedup.shingleRows(bench, n)
      .select(xxhash64(col("shingle")).as("h"))
      .distinct().collect().map(_.getLong(0))
    java.util.Arrays.sort(hs)
    hs
  }

  private val setCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** Train-once cache per (corpus dir, n) — the cachedRatioModel
    * pattern; racing builds are deterministic so first-put wins.
    */
  def cachedBenchGramHashes(bench: DataFrame, cacheKey: String,
      n: Int = 8): Array[Long] = {
    val cached = setCache.get(cacheKey)
    if (cached != null) cached
    else {
      val a = benchGramHashes(bench, n)
      val prev = setCache.putIfAbsent(cacheKey, a)
      if (prev != null) prev else a
    }
  }

  /** Contamination verdicts for a (streaming or batch) document
    * relation: (doc_id, n_hit_grams) for every document with at least
    * one shingle instance fingerprinting into the benchmark set.
    * Stateless — safe in append mode with no watermark.
    */
  def verdicts(docs: DataFrame, sorted: Array[Long], n: Int = 8): DataFrame =
    docs.select(col("doc_id"),
        toColumn(graft.functions.GramSetHits(
          toExpression(col("text")), n, sorted)).cast("long").as("n_hit_grams"))
      .filter(col("n_hit_grams") > 0)
}
