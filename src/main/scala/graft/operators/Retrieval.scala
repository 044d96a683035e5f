package graft.operators

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval over the documents corpus — the sparse
  * (inverted-index) half of the similarity-search family, next to the
  * dense ANN operators in [[Similarity]]. An LLM-data pipeline runs
  * exactly this shape for retrieval-based decontamination ("which
  * corpus documents score highest against an eval query?") and for
  * corpus search/inspection tooling.
  *
  * Scoring is Okapi BM25 (k1 = 1.2, b = 0.75, the +1 idf variant that
  * keeps idf positive for df > N/2 — this vocabulary is ~30 terms, so
  * every term is in most documents and the classic idf would go
  * negative): score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
  *
  * Exactness discipline (the [[LanguageModel]] precedent): the one
  * transcendental per term — ln in idf — is quantized with
  * round(·, 9) → DECIMAL(18,9); every per-(doc, term) contribution is
  * likewise rounded to DECIMAL(18,9) after a double expression written
  * with IDENTICAL association in both engines; the final score is an
  * exact decimal sum of ≤3 such contributions. No float accumulation
  * order can flip the gate.
  *
  * 100 TB shape: ONE corpus scan. The per-document tf/dl statistics
  * for a fixed query-term set pivot into a single map-side-combinable
  * aggregate (count + conditional counts per term) — there is no
  * (doc, term) shuffle, no posting-list relation materialized for a
  * top-k query with a known term set. The corpus-level constants
  * (N, avgdl, df_t) reduce from the per-doc relation (already tiny:
  * one row per document) and come back as a 1-row broadcast. A serving
  * deployment would precompute the per-doc relation once and reuse it
  * across queries — the declared query prices the cold path.
  */
object Retrieval {

  /** Fixed retrieval query: three mid-frequency vocabulary terms. */
  val QueryTerms = Seq("join", "scan", "window")

  private val K1 = 1.2
  private val B = 0.75

  val qBm25TopK = DeclaredQuery(
    "q_bm25_topk",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
       |       WHERE w IN (${QueryTerms.map("'" + _ + "'").mkString(", ")})
       |       GROUP BY 1, 2),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
       |idf AS (SELECT w, CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 9)
       |                       AS DECIMAL(18,9)) AS idf FROM df, stats),
       |contrib AS (
       |  SELECT tf.doc_id, tf.w,
       |         CAST(round(CAST(idf.idf AS DOUBLE) *
       |            ((CAST(tf.tf AS DOUBLE) * ${K1 + 1.0}) /
       |             (CAST(tf.tf AS DOUBLE) + $K1 * (${1.0 - B} + $B *
       |              (CAST(dl.dl AS DOUBLE) / stats.avgdl)))), 9)
       |              AS DECIMAL(18,9)) AS c
       |  FROM tf JOIN dl USING (doc_id) JOIN idf USING (w), stats)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |       CAST(CAST(sum(c) AS DECIMAL(28,9)) AS DOUBLE) AS score
       |FROM contrib GROUP BY doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT 25""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // one corpus scan: unigram stream → per-doc (dl, tf_t...) pivot
    val tok = docs.select(col("doc_id"), expr("token_ngrams(text, 1)"))
      .select(col("doc_id"), col("shingle").as("w"))
    val perAggs = QueryTerms.map(t =>
      count(when(col("w") === t, 1)).as(s"tf_$t"))
    // one row per document; checkpointed because both the corpus
    // constants AND the scoring pass read it — the single corpus scan
    // this operator promises happens exactly once, here
    val per = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), perAggs: _*)
      .localCheckpoint()
    // corpus constants from the per-doc relation (O(docs) rows, never
    // the corpus): N, avgdl, df per term — one 1-row broadcast
    val constAggs = (sum("dl").cast("double") / count(lit(1))).as("avgdl") +:
      QueryTerms.map(t => count(when(col(s"tf_$t") > 0, 1)).as(s"df_$t"))
    val consts = per.agg(count(lit(1)).cast("double").as("n_docs"), constAggs: _*)
    val scored = per.crossJoin(broadcast(consts))
    // idf_t quantized exactly like the oracle's idf CTE
    def idfCol(t: String) =
      round(log((col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5) + 1.0), 9)
        .cast("decimal(18,9)")
    // per-term contribution: the double expression below is
    // association-identical to the oracle's contrib CTE
    def contribCol(t: String) = {
      val tfD = col(s"tf_$t").cast("double")
      val dlD = col("dl").cast("double")
      when(col(s"tf_$t") > 0,
        round(idfCol(t).cast("double") *
          ((tfD * lit(K1 + 1.0)) /
           (tfD + lit(K1) * (lit(1.0 - B) + lit(B) * (dlD / col("avgdl"))))), 9)
          .cast("decimal(18,9)"))
    }
    val withC = scored.select(
      col("doc_id") +:
        QueryTerms.map(t => contribCol(t).as(s"c_$t")): _*)
    val zero = lit(0).cast("decimal(18,9)")
    withC
      .withColumn("n_terms",
        QueryTerms.map(t => when(col(s"c_$t").isNotNull, 1L).otherwise(0L))
          .reduce(_ + _))
      .filter(col("n_terms") > 0)
      .withColumn("score",
        QueryTerms.map(t => coalesce(col(s"c_$t"), zero)).reduce(_ + _)
          .cast("decimal(28,9)").cast("double"))
      .select(col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(25)
  }

  val all: Seq[DeclaredQuery] = Seq(qBm25TopK)
}
