package graft.operators

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (prompt requirement;
  * SURVEY.md §2 K5-K7): language-ID, quality scoring, token counting,
  * all as declarative aggregations that scale linearly.
  */
object TextAnalysis {

  /** Per-doc distinct char trigrams with the doc's label — the shared
    * relation both the profile learner and the classifier consume
    * (callers persist it when fanning out to both).
    *
    * Round-3 rewrite: the round-2 form exploded
    * `transform(sequence(...), i -> substring(text, i, 3))` — a
    * higher-order function, which Spark evaluates INTERPRETED (one
    * lambda frame per gram, no codegen) and which materializes the
    * full gram array per doc. The [[graft.functions.CharNGrams]]
    * generator streams grams lazily instead; per-doc dedup then rides
    * the map-side partial aggregate of `.distinct()` — so the shuffle
    * carries only distinct (doc, trigram) pairs. Whole-text fallback
    * under 3 code points as before; NULL text → no rows, which also
    * FIXES the round-2 form's spurious NULL-trigram row per NULL-text
    * doc (greatest() skips NULLs there, so substring(NULL,…) survived
    * array_distinct/explode) — the generator matches the relational
    * inner join, which drops NULL keys.
    */
  def docTrigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      expr("char_ngrams(text, 3) AS trigram"))
      .distinct()

  /** Char-trigram profiles per language: top `profileSize` trigrams by
    * document frequency (deterministic tiebreak).
    */
  def langProfiles(docTri: DataFrame, profileSize: Int = 30): DataFrame = {
    val tri = docTri.groupBy("lang", "trigram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("trigram"))
    tri.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= profileSize)
      .select("lang", "trigram", "n")
  }

  /** [[langProfiles]] fused over raw docs: count(DISTINCT doc_id) per
    * (lang, trigram) replaces the separate `.distinct()` shuffle of
    * [[docTrigrams]] — document frequency in one aggregate. Identical
    * result (df = |distinct docs containing the trigram| either way).
    */
  def langProfilesFromDocs(docs: DataFrame, profileSize: Int = 30): DataFrame = {
    val tri = docs
      .select(col("doc_id"), col("lang"), expr("char_ngrams(text, 3) AS trigram"))
      .groupBy("lang", "trigram").agg(countDistinct(col("doc_id")).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("trigram"))
    tri.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= profileSize)
      .select("lang", "trigram", "n")
  }

  /** Collect a learned profile relation into the driver-resident model
    * the codegen'd scorer carries (langs × profileSize strings).
    */
  def trigramModel(profiles: DataFrame): graft.functions.TrigramProfiles = {
    val prof: Array[(String, Array[String])] = profiles
      .select("lang", "trigram").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getString(1)).toArray).toArray.sortBy(_._1)
    new graft.functions.TrigramProfiles(prof.map(_._1), prof.map(_._2))
  }

  /** Train-once / score-many: the learned model is a pure function of
    * the corpus directory (deterministic learning pipeline), so it is
    * cached per directory like the IVF index — the serving pattern for
    * model-parameter operators. First call pays the profile-learning
    * aggregation; every later call is scoring only.
    */
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), graft.functions.TrigramProfiles]()

  // keyed by (session, dir) like LanguageModel.artifactCache — a
  // dir-only key would serve a stale model to a later session over a
  // regenerated same-named directory (round-14 review, advisor r11
  // invariant). Compute OUTSIDE the map (Memo.memo): computeIfAbsent
  // holds the bin lock for the mapping function's whole duration —
  // here a multi-second Spark job. Racing computes are idempotent
  // (deterministic pipeline); first put wins.
  def cachedTrigramModel(docs: DataFrame, cacheKey: String): graft.functions.TrigramProfiles =
    graft.Memo.memo(modelCache, (docs.sparkSession, cacheKey))(
      trigramModel(langProfilesFromDocs(docs)))

  /** Broadcast-scoring language ID — the serving form: profiles are
    * MODEL PARAMETERS (langs × profileSize trigrams ≈ 150 rows, like
    * IVF centroids), so they collect to the driver and broadcast; each
    * doc is then scored in ONE pass with no join, no re-explode, no
    * per-doc window. Same argmax + lang-ascending tiebreak as
    * [[languageId]], and the same row set: NULL-text docs and docs
    * with zero overlap against every profile are dropped, exactly as
    * the relational form's inner trigram join drops them. Use the
    * relational [[languageId]] only when the profile model itself is
    * too large to broadcast.
    */
  def languageIdBroadcast(docs: DataFrame, profiles: DataFrame): DataFrame =
    scoreWithModel(docs, trigramModel(profiles))

  /** Score docs against a driver-resident model in one codegen'd scan.
    * (Round-3 rewrite: scoring was a per-row Scala UDF — catalyst
    * converters per row + a codegen break; LangIdScore is a codegen'd
    * Expression carrying the model via addReferenceObj, so the scan
    * stays in one WholeStageCodegen span. Lang-ascending model order
    * makes "first strictly-greater wins" equal to the relational
    * form's (overlap desc, lang asc) row_number tiebreak.)
    */
  def scoreWithModel(docs: DataFrame,
      model: graft.functions.TrigramProfiles): DataFrame = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        toColumn(graft.functions.LangIdScore(toExpression(col("text")), model)).as("s"))
      .select(col("doc_id"), col("s.predicted_lang").as("predicted_lang"),
        col("s.overlap").as("overlap"))
      // zero-overlap docs have no candidate langs in the relational
      // form (inner join on trigram) — drop them here too
      .filter(col("overlap") > 0)
  }

  /** N-gram-heuristic language ID, relational form: score each doc
    * against each lang profile by distinct-trigram overlap, predict
    * the argmax (deterministic tiebreak on lang). Scales to profile
    * models too large to broadcast; for normal profile sizes prefer
    * [[languageIdBroadcast]] (no join/window over the exploded
    * trigram relation).
    */
  def languageId(docTri: DataFrame, profiles: DataFrame): DataFrame = {
    val scored = docTri
      .join(profiles.select(col("lang").as("cand_lang"), col("trigram")), Seq("trigram"))
      .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy("doc_id").orderBy(col("overlap").desc, col("cand_lang"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang").as("predicted_lang"), col("overlap"))
  }

  /** Per-doc quality signals: token count (whitespace + BPE-ish
    * alnum-run), mean token length, type-token ratio, uppercase &
    * punctuation ratios (fixture text is lowercase alnum — the
    * operators still compute the general form).
    */
  def qualityScores(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      size(split(col("text"), " ")).as("n_tokens"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_alnum_tokens"),
      size(array_distinct(split(col("text"), " "))).as("n_types"),
      (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).as("n_punct"))
      .withColumn("type_token_ratio", col("n_types").cast("double") / col("n_tokens"))
      .withColumn("avg_token_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))

  // ---- declared queries ----

  /** Language-ID predictions vs labels (mechanics demo — rows-only;
    * confusion counts are asserted in ScalaTest).
    */
  /** Round-4 upgrade: the learning+scoring pipeline is DETERMINISTIC
    * end-to-end (distinct trigrams, count-distinct document frequency,
    * (n DESC, trigram ASC) profile cut, (overlap DESC, lang ASC)
    * argmax), so the confusion matrix carries a full DuckDB oracle —
    * the SQL twin recomputes profiles and predictions from scratch.
    */
  val qLangId = DeclaredQuery(
    "q_language_id",
    """WITH tri AS (
      |  SELECT DISTINCT d.doc_id, d.lang, substring(d.text, i, 3) AS trigram
      |  FROM documents d, LATERAL (
      |    SELECT unnest(generate_series(1, greatest(len(d.text) - 2, 1))) AS i) g
      |  WHERE d.text IS NOT NULL),
      |prof AS (
      |  SELECT lang, trigram, count(DISTINCT doc_id) AS n
      |  FROM tri GROUP BY lang, trigram),
      |top_prof AS (
      |  SELECT lang AS cand_lang, trigram FROM (
      |    SELECT lang, trigram,
      |           row_number() OVER (PARTITION BY lang ORDER BY n DESC, trigram) AS rn
      |    FROM prof) WHERE rn <= 30),
      |scored AS (
      |  SELECT t.doc_id, p.cand_lang, count(*) AS overlap
      |  FROM (SELECT DISTINCT doc_id, trigram FROM tri) t
      |  JOIN top_prof p ON t.trigram = p.trigram
      |  GROUP BY t.doc_id, p.cand_lang),
      |pred AS (
      |  SELECT doc_id, cand_lang AS predicted_lang FROM (
      |    SELECT doc_id, cand_lang,
      |           row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, cand_lang) AS rn
      |    FROM scored) WHERE rn = 1)
      |SELECT d.lang, p.predicted_lang, CAST(count(*) AS BIGINT) AS n
      |FROM pred p JOIN documents d ON d.doc_id = p.doc_id
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // train-once / score-many: profile learning (char_ngrams →
    // count-distinct-doc aggregate → per-lang top-30) runs once per
    // corpus directory and is cached as model parameters — the same
    // index/probe split as IVF. Scoring is ONE codegen'd scan against
    // the in-plan model: no second explode, no score join, no per-doc
    // window. The learning pipeline is deterministic, so cached vs
    // fresh models are identical.
    scoreWithModel(docs, cachedTrigramModel(docs, d))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted_lang")
  }

  /** Weak-supervision quality classifier — the CCNet/FastText-style
    * learned quality gate, as train-once/score-many:
    *
    *  - features: the [[qualityScores]] surface stats (token count,
    *    type/token ratio, average token length, punctuation and
    *    alphanumeric fractions);
    *  - weak labels: the heuristic score's own top/bottom quartiles
    *    (no human labels exist at corpus scale — production pipelines
    *    bootstrap exactly this way, e.g. "wiki-like vs crawl-tail");
    *  - model: seeded MLlib logistic regression, trained ONCE per
    *    corpus dir and cached ([[cachedQualityModel]] — same
    *    index/probe split as language-ID and IVF);
    *  - scoring: NOT MLlib's transform (a per-row udf) — the learned
    *    coefficients are lifted into plain Column arithmetic
    *    (`sigmoid(w·x + b)` as literals), so the score-many path is
    *    one codegen'd scan at any corpus size.
    */
  def qualityFeatures(docs: DataFrame): DataFrame =
    qualityScores(docs).select(
      col("doc_id"), col("source"),
      col("n_tokens").cast("double").as("f_tokens"),
      col("type_token_ratio").as("f_ttr"),
      col("avg_token_len").as("f_atl"),
      // nullif guard: a zero-char doc would otherwise produce native
      // 0.0/0.0 = NaN (doubles don't null out on zero division) and
      // poison every aggregate it reaches; NULL propagates cleanly
      (col("n_punct").cast("double") / nullif(col("n_chars"), lit(0))).as("f_punct"),
      (col("n_alnum_tokens").cast("double") / col("n_tokens")).as("f_alnum"))
      .withColumn("heuristic",
        col("f_ttr") + col("f_alnum") - col("f_punct"))

  private val featureCols = Seq("f_tokens", "f_ttr", "f_atl", "f_punct", "f_alnum")

  final case class QualityModel(weights: Array[Double], intercept: Double)

  def trainQualityModel(docs: DataFrame, seed: Long = 42L): Option[QualityModel] = {
    val feats = qualityFeatures(docs)
    if (feats.isEmpty) return None
    // approxQuantile ignores NULLs and returns an EMPTY array when no
    // non-null heuristic values exist (e.g. all-NULL-text corpus) —
    // that corpus trains no model, same as the empty case
    val qs = feats.stat.approxQuantile("heuristic", Array(0.25, 0.75), 0.001)
    if (qs.length < 2) return None
    val Array(q25, q75) = qs
    val labeled = feats
      .withColumn("label",
        when(col("heuristic") >= q75, 1.0)
          .when(col("heuristic") <= q25, 0.0))
      .filter(col("label").isNotNull)
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(labeled)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(50).setRegParam(0.01)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(assembled)
    Some(QualityModel(lr.coefficients.toArray, lr.intercept))
  }

  /** Codegen'd scoring scan: sigmoid of the literal-coefficient dot
    * product — no MLlib udf in the score-many path.
    */
  def scoreQuality(docs: DataFrame, model: QualityModel): DataFrame = {
    val feats = qualityFeatures(docs)
    val z = featureCols.zip(model.weights)
      .map { case (c, w) => col(c) * lit(w) }
      .foldLeft(lit(model.intercept): org.apache.spark.sql.Column)(_ + _)
    feats.withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-z)))
  }

  private val qualityCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), QualityModel]()

  // (session, dir) keying — see cachedTrigramModel (round-14 review)
  def cachedQualityModel(docs: DataFrame, cacheKey: String): Option[QualityModel] = {
    val key = (docs.sparkSession, cacheKey)
    val cached = qualityCache.get(key)
    if (cached != null) Some(cached)
    else trainQualityModel(docs) match {
      case None => None
      case Some(m) =>
        val prev = qualityCache.putIfAbsent(key, m)
        Some(if (prev != null) prev else m)
    }
  }

  /** MLlib logistic-regression quality gate — kept as the library API
    * for when a production pipeline wants a regularized solver;
    * TextAnalysisSpec asserts the model separates its weak extremes
    * and that scoring stays udf-free. The DECLARED `q_quality_classifier`
    * below trains the deterministic fixed-round twin instead, which is
    * what the DuckDB oracle can replay.
    */
  def mlQualityClassifier(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    cachedQualityModel(docs, d) match {
      case Some(m) =>
        scoreQuality(docs, m)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            round(avg("quality_prob"), 6).as("avg_quality_prob"),
            count(when(col("quality_prob") >= 0.5, 1)).as("n_keep"))
          .orderBy("source")
      case None =>
        docs.select(col("source"), lit(0L).as("n_docs"),
          lit(0.0).as("avg_quality_prob"), lit(0L).as("n_keep")).limit(0)
    }
  }

  // ---- deterministic fixed-round quality classifier (round 12) ----
  //
  // The gated replacement for the MLlib LR: R rounds of squared-loss
  // gradient descent on the same 5 weak-supervision features, in the
  // exact quantized arithmetic that converted IVF (quantized Lloyd)
  // and BPE (unrolled merges) — every per-doc quantity is an integer
  // on a fixed micro-grid, every sum is an integer sum (order-free),
  // and every weight update is one fixed-shape IEEE expression over
  // exactly-representable operands, so Spark and a chained-CTE DuckDB
  // replay produce bit-identical weights after every round.
  //
  // Magnitude audit (why nothing overflows or rounds differently):
  //   features normalized to x ∈ [0, Sx=1e4]; weights clamped to
  //   |W| ≤ Sw·10 = 1e7 ⇒ |z| = |Σ W·x| ≤ 6e11 (long-exact);
  //   residual |rs| ≤ 6.1e11; gradient term |rs·x| ≤ 6.1e15 < 2^53
  //   (double-exact product) ⇒ floor(rs·x/1e10) deterministic;
  //   per-round gradient sum |Σ| ≤ n·6.1e5 (long sum, no overflow).

  /** GD rounds / learning rate (lr = 0.2 enters the update as the
    * exactly-representable combined constant 20.0 = lr·Sw/Sx). 12
    * rounds with clamped weights separates the weak extremes on the
    * fixture (QcDeterministicSpec) and keeps the oracle's unrolled
    * chain affordable.
    */
  val QcRounds = 12
  private val QcWClamp = 10000000L // |w_real| ≤ 10 on the Sw=1e6 grid

  /** Learned model: 6 integer weights (bias first) on the Sw=1e6 grid
    * plus the min/max normalization constants (per-feature micro-unit
    * bounds) scoring must reuse.
    */
  final case class QcModel(weights: Array[Long], mins: Array[Long], maxs: Array[Long])

  // the ONE feature-name list (round-14 review: a second verbatim Seq
  // here meant adding a quality feature could silently train the
  // quantized-GD and MLlib models on different feature sets)
  private val qcFeatNames = featureCols

  /** Per-doc quantized raw features: `floor(f·1e6 + 0.5)` BIGINT per
    * feature (the q_math_funcs discipline) + the quantized heuristic
    * used for weak labels. Docs with any NULL feature (NULL text,
    * zero-char docs) are excluded — identically in the oracle.
    */
  def qcQuantDocs(docs: DataFrame): DataFrame = {
    val feats = qualityFeatures(docs)
      .filter(qcFeatNames.map(col(_).isNotNull).reduce(_ && _))
    val qs = qcFeatNames.zipWithIndex.map { case (f, i) =>
      floor(col(f) * lit(1000000.0) + lit(0.5)).cast("long").as(s"q${i + 1}")
    }
    feats.select(
      (Seq(col("doc_id"), col("source")) ++ qs :+
        floor(col("heuristic") * lit(1000000.0) + lit(0.5)).cast("long").as("qh")): _*)
  }

  /** Min-max normalize quantized features onto [0, 1e4]:
    * `floor((q-mn)·1e4/(mx-mn) + 0.5)` — the product (q-mn)·1e4 stays
    * < 2^53 (exact), the division is one correctly-rounded IEEE op, so
    * the grid value is portable. Constant features map to 0.
    */
  private def qcNormalize(q: DataFrame, mins: Array[Long], maxs: Array[Long]): DataFrame = {
    val xs = (1 to 5).map { j =>
      val (mn, mx) = (mins(j - 1), maxs(j - 1))
      val c =
        if (mx > mn)
          floor((col(s"q$j") - lit(mn)).cast("double") * lit(10000.0) /
            lit((mx - mn).toDouble) + lit(0.5)).cast("long")
        else lit(0L)
      c.as(s"x$j")
    }
    q.select((Seq(col("doc_id"), col("source"), col("qh")) ++ xs): _*)
  }

  /** z on the Sw·Sx = 1e10 grid: Σ W_j·x_j with x_0 ≡ Sx (bias). */
  private def qcZ(w: Array[Long]): org.apache.spark.sql.Column =
    (1 to 5).map(j => lit(w(j)) * col(s"x$j"))
      .foldLeft(lit(w(0) * 10000L): org.apache.spark.sql.Column)(_ + _)

  /** Train the fixed-round quantized-GD model. Weak labels are the
    * heuristic's top/bottom quartiles by EXACT order statistic over
    * the quantized-heuristic histogram — a domain-bounded relation
    * (≤3e6 distinct micro-values regardless of corpus size, the
    * chi²/BM25 discipline), so the cumulative window never sorts
    * data-sized input. Each GD round is ONE codegen'd aggregate over
    * the labeled design matrix (weights enter as literals); updates
    * happen on the driver in the same exact arithmetic the oracle
    * replays.
    */
  def trainQcModel(docs: DataFrame): QcModel = {
    val q = qcQuantDocs(docs)
    val mmAggs = (1 to 5).flatMap(j => Seq(min(s"q$j"), max(s"q$j"))) :+ count(lit(1))
    val mmRow = q.agg(mmAggs.head, mmAggs.tail: _*).collect()(0)
    val n = mmRow.getLong(10)
    if (n == 0L) return QcModel(Array.fill(6)(0L), Array.fill(5)(0L), Array.fill(5)(0L))
    val mins = Array.tabulate(5)(j => mmRow.getLong(2 * j))
    val maxs = Array.tabulate(5)(j => mmRow.getLong(2 * j + 1))
    // exact quartile thresholds from the qh histogram
    val m = math.max(n / 4, 1L)
    val hist = q.groupBy("qh").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // two cumulative consumers
    import org.apache.spark.sql.expressions.Window
    val tHi = hist
      .withColumn("cum", sum("c").over(Window.orderBy(col("qh").desc)))
      .filter(col("cum") >= m).agg(max("qh")).collect()(0).getLong(0)
    val tLo = hist
      .withColumn("cum", sum("c").over(Window.orderBy(col("qh").asc)))
      .filter(col("cum") >= m).agg(min("qh")).collect()(0).getLong(0)
    val x = qcNormalize(q, mins, maxs)
    val lab = x
      .filter((col("qh") >= tHi) =!= (col("qh") <= tLo))
      .withColumn("y10",
        when(col("qh") >= tHi, lit(10000000000L)).otherwise(lit(0L)))
      .select((("y10" +: (1 to 5).map(j => s"x$j")).map(col)): _*)
      .localCheckpoint(false) // consumed once per GD round
    val nl = math.max(lab.count(), 1L)
    var w = Array.fill(6)(0L)
    for (_ <- 1 to QcRounds) {
      val rs = qcZ(w) - col("y10")
      def gTerm(xj: org.apache.spark.sql.Column) =
        sum(floor((rs * xj).cast("double") / lit(1.0e10)).cast("long"))
      val gAggs = gTerm(lit(10000L)) +: (1 to 5).map(j => gTerm(col(s"x$j")))
      val gRow = lab.agg(gAggs.head, gAggs.tail: _*).collect()(0)
      w = Array.tabulate(6) { j =>
        val g = if (gRow.isNullAt(j)) 0L else gRow.getLong(j)
        val upd = w(j) - math.floor(20.0 * g.toDouble / nl + 0.5).toLong
        math.max(-QcWClamp, math.min(QcWClamp, upd))
      }
    }
    QcModel(w, mins, maxs)
  }

  private val qcCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), QcModel]()

  /** Train-once/score-many: deterministic learning ⇒ cached ≡ fresh.
    * Keyed by (session, dir) like the round-11 artifact caches. The
    * empty-corpus zero model is NOT cached (nothing was learned).
    */
  def cachedQcModel(s: org.apache.spark.sql.SparkSession, docs: DataFrame,
      d: String): QcModel = {
    val cached = qcCache.get((s, d))
    if (cached != null) cached
    else {
      val m = trainQcModel(docs)
      if (m.mins.sameElements(m.maxs) && m.weights.forall(_ == 0L)) m
      else {
        val prev = qcCache.putIfAbsent((s, d), m)
        if (prev != null) prev else m
      }
    }
  }

  /** Per-doc scores on the 1e10 z-grid (library surface + spec hook):
    * (doc_id, source, qh, z).
    */
  def qcScorePerDoc(docs: DataFrame, m: QcModel): DataFrame =
    qcNormalize(qcQuantDocs(docs), m.mins, m.maxs)
      .select(col("doc_id"), col("source"), col("qh"), qcZ(m.weights).as("z"))

  /** Score every featurizable doc with the literal-weight linear model
    * (one codegen'd scan — no join, no UDF) and roll up per source:
    * keep-count at the z ≥ 0.5 gate and the mean score in integer
    * micro-units via the floor(Σ/n + 0.5) discipline (per-doc micro
    * scores are integers, so the sum is exact and order-free).
    */
  def qcScore(docs: DataFrame, m: QcModel): DataFrame =
    qcNormalize(qcQuantDocs(docs), m.mins, m.maxs)
      .select(col("source"), qcZ(m.weights).as("z"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("z") >= 5000000000L, 1)).as("n_keep"),
        floor(
          sum(floor(col("z").cast("double") / lit(10000.0) + lit(0.5)).cast("long"))
            .cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("avg_q_micro"))
      .orderBy("source")

  /** DuckDB replay of [[trainQcModel]] + [[qcScore]]: one MATERIALIZED
    * CTE per GD round (the BPE/Lloyd unroll — MATERIALIZED is
    * load-bearing, inlining is exponential), exact-integer gradients,
    * the same floor/clamp update, the same scoring rollup.
    */
  private def qcOracle(rounds: Int): String = {
    val featSel =
      """CAST(len(string_split(text, ' ')) AS DOUBLE) AS f1,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' ')) AS f2,
        |         CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |           / len(string_split(text, ' ')) AS f3,
        |         CAST(len(text) - len(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
        |           / NULLIF(n_chars, 0) AS f4,
        |         CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS DOUBLE)
        |           / len(string_split(text, ' ')) AS f5""".stripMargin
    val quant = (1 to 5).map(j =>
      s"CAST(floor(f$j * 1000000.0 + 0.5) AS BIGINT) AS q$j").mkString(",\n         ")
    val mm = (1 to 5).map(j => s"min(q$j) AS mn$j, max(q$j) AS mx$j").mkString(", ")
    val norm = (1 to 5).map(j =>
      s"""CASE WHEN mm.mx$j > mm.mn$j
         |      THEN CAST(floor(CAST(q.q$j - mm.mn$j AS DOUBLE) * 10000.0
         |                      / (mm.mx$j - mm.mn$j) + 0.5) AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS x$j""".stripMargin).mkString(",\n    ")
    def z(alias: String) =
      s"$alias.w0 * 10000 + " + (1 to 5).map(j => s"$alias.w$j * x$j").mkString(" + ")
    val gSums = ("10000" +: (1 to 5).map(j => s"x$j")).zipWithIndex.map { case (xj, j) =>
      s"COALESCE(sum(CAST(floor(CAST(rs * $xj AS DOUBLE) / 10000000000.0) AS BIGINT)), 0) AS g$j"
    }.mkString(",\n           ")
    val updates = (0 to 5).map(j =>
      s"""greatest(-10000000, least(10000000,
         |      w.w$j - CAST(floor(20.0 * CAST(g.g$j AS DOUBLE) / n.nl + 0.5) AS BIGINT))) AS w$j""".stripMargin)
      .mkString(",\n    ")
    val roundCtes = (1 to rounds).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT x1, x2, x3, x4, x5, (${z("w")}) - y10 AS rs FROM lab, w${k - 1} w),
         |g$k AS MATERIALIZED (
         |  SELECT $gSums
         |    FROM r$k),
         |w$k AS MATERIALIZED (
         |  SELECT $updates
         |  FROM w${k - 1} w, g$k g, nlab n)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS MATERIALIZED (
       |  SELECT doc_id, source,
       |         $featSel
       |  FROM documents),
       |q AS MATERIALIZED (
       |  SELECT doc_id, source,
       |         $quant,
       |         CAST(floor(((f2 + f5) - f4) * 1000000.0 + 0.5) AS BIGINT) AS qh
       |  FROM f
       |  WHERE f1 IS NOT NULL AND f2 IS NOT NULL AND f3 IS NOT NULL
       |    AND f4 IS NOT NULL AND f5 IS NOT NULL),
       |mm AS (SELECT $mm FROM q),
       |x AS MATERIALIZED (
       |  SELECT q.doc_id, q.source, q.qh,
       |    $norm
       |  FROM q, mm),
       |st AS (SELECT greatest(count(*) // 4, 1) AS m FROM x),
       |thi AS (SELECT max(qh) AS t FROM (
       |  SELECT qh, sum(c) OVER (ORDER BY qh DESC) AS cum
       |  FROM (SELECT qh, count(*) AS c FROM x GROUP BY qh)) h, st
       |  WHERE h.cum >= st.m),
       |tlo AS (SELECT min(qh) AS t FROM (
       |  SELECT qh, sum(c) OVER (ORDER BY qh ASC) AS cum
       |  FROM (SELECT qh, count(*) AS c FROM x GROUP BY qh)) h, st
       |  WHERE h.cum >= st.m),
       |lab AS MATERIALIZED (
       |  SELECT x1, x2, x3, x4, x5,
       |         CASE WHEN qh >= thi.t THEN CAST(10000000000 AS BIGINT)
       |              ELSE CAST(0 AS BIGINT) END AS y10
       |  FROM x, thi, tlo
       |  WHERE ((qh >= thi.t) AND NOT (qh <= tlo.t))
       |     OR ((qh <= tlo.t) AND NOT (qh >= thi.t))),
       |nlab AS (SELECT greatest(count(*), 1) AS nl FROM lab),
       |w0 AS MATERIALIZED (
       |  SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |         CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
       |         CAST(0 AS BIGINT) AS w4, CAST(0 AS BIGINT) AS w5),
       |$roundCtes,
       |sc AS MATERIALIZED (
       |  SELECT x.source, ${z("w")} AS z FROM x, w$rounds w)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) FILTER (WHERE z >= 5000000000) AS BIGINT) AS n_keep,
       |  CAST(floor(CAST(sum(CAST(floor(CAST(z AS DOUBLE) / 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |             / count(*) + 0.5) AS BIGINT) AS avg_q_micro
       |FROM sc GROUP BY source ORDER BY source""".stripMargin
  }

  /** Learned quality gate per source — VALUE-GATED as of round 12: the
    * deterministic fixed-round quantized-GD learner replaces the MLlib
    * LR in the declared query ([[mlQualityClassifier]] stays as the
    * library API), and the oracle replays all [[QcRounds]] update
    * rounds as chained CTEs.
    */
  val qQualityClassifier = DeclaredQuery(
    "q_quality_classifier", qcOracle(QcRounds)) { (s, d) =>
    val docs = Tables.documents(s, d)
    qcScore(docs, cachedQcModel(s, docs, d))
  }

  /** Quality-score distribution per source — SQL-expressible, so it
    * carries a full oracle.
    */
  val qQuality = DeclaredQuery(
    "q_quality_scores",
    """SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
      |  CAST(sum(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS sum_types,
      |  round(CAST(sum(len(list_distinct(string_split(text, ' ')))) AS DOUBLE)
      |        / sum(len(string_split(text, ' '))), 6) AS type_token_ratio
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("sum_tokens"),
        sum(size(array_distinct(split(col("text"), " ")))).as("sum_types"),
        round(sum(size(array_distinct(split(col("text"), " ")))).cast("double") /
          sum(size(split(col("text"), " "))), 6).as("type_token_ratio"))
      .orderBy("source")
  }

  /** BPE-style pre-tokenization counts (the GPT-2 pretokenizer shape:
    * letter runs | digit runs | punctuation, before any merges) — the
    * token-budget accounting a training pipeline runs corpus-wide.
    * Pure regexp aggregation: one scan, partial+final agg, no explode.
    */
  val qBpeTokens = DeclaredQuery(
    "q_bpe_tokens",
    """SELECT lang,
      |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS sum_bpe_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT) AS sum_num_tokens,
      |  CAST(max(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS max_word_tokens
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        sum(size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")))
          .cast("long").as("sum_bpe_tokens"),
        sum(size(expr("regexp_extract_all(text, '[0-9]+', 0)")))
          .cast("long").as("sum_num_tokens"),
        max(size(expr("regexp_extract_all(text, '[a-z]+', 0)")))
          .cast("long").as("max_word_tokens"))
      .orderBy("lang")
  }

  /** The custom char_ngrams Generator (J4) end-to-end and hash-gated:
    * per-language distinct-trigram vocabulary + total gram volume.
    * The generator streams grams through GenerateExec one at a time
    * (no per-doc array materialization — see CharNGrams scaladoc);
    * the oracle reproduces it with a LATERAL generate_series.
    */
  val qCharNgrams = DeclaredQuery(
    "q_char_ngrams",
    """SELECT lang,
      |  CAST(count(DISTINCT substring(text, i, 3)) AS BIGINT) AS n_distinct_trigrams,
      |  CAST(count(*) AS BIGINT) AS n_grams
      |FROM documents, LATERAL (
      |  SELECT unnest(generate_series(1, greatest(len(text) - 2, 1))) AS i) g
      |WHERE text IS NOT NULL
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), expr("char_ngrams(text, 3)"))
      .groupBy("lang")
      .agg(countDistinct(col("ngram")).as("n_distinct_trigrams"),
        count(lit(1)).as("n_grams"))
      .orderBy("lang")
  }

  /** Gopher-style repetition filter (round 9): per-doc duplicate-bigram
    * fraction and top-bigram mass — the "repetitious document" signals
    * from the Gopher data-curation rules (Rae et al. 2021, public):
    * boilerplate/spam pages repeat the same n-grams, and a corpus
    * filter drops docs whose duplicate-n-gram fraction exceeds a
    * threshold. Two signals per doc from ONE gram-count relation:
    * `dup_frac` = 1 − distinct/total bigrams, `top_frac` = modal
    * bigram count / total.
    *
    * 100 TB shape: the codegen'd [[graft.functions.TokenNGrams]]
    * generator streams bigrams without materializing per-doc arrays;
    * counts ride a (doc_id, shingle) hash aggregate whose map-side
    * partial collapses within-partition repeats, then one per-doc
    * rollup — two shuffles both keyed by doc-prefixed keys, linear in
    * corpus size, no joins. The whole-text fallback for sub-2-token
    * docs (one gram = the text itself, dup_frac 0) matches the
    * generator's documented clamp, replayed in the oracle via the
    * same `greatest(len-1, 1)` + clamped-slice idiom as
    * `q_decontaminate`.
    */
  val qGopherRepetition = DeclaredQuery(
    "q_gopher_repetition",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |           WHERE text IS NOT NULL),
      |g AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
      |      FROM t, LATERAL (
      |        SELECT unnest(generate_series(1, greatest(len(w) - 1, 1))) AS i) s),
      |cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      |per AS (SELECT doc_id,
      |               CAST(sum(c) AS BIGINT) AS n_grams,
      |               CAST(count(*) AS BIGINT) AS n_distinct,
      |               CAST(max(c) AS BIGINT) AS top_count
      |        FROM cnt GROUP BY 1)
      |SELECT doc_id, n_grams, n_distinct, top_count,
      |  round(CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS dup_frac,
      |  round(CAST(top_count AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS top_frac
      |FROM per ORDER BY doc_id""".stripMargin) { (s, d) =>
    // Round-12 rewrite: a doc's gram histogram is a pure function of
    // its own text, so BOTH aggregates fuse into per-row codegen'd
    // expressions — token_ngram_stats (total + modal count) and
    // token_ngram_distinct (distinct count) — and the exploded
    // (doc, shingle) relation, its two shuffles, and their hash
    // aggregates disappear entirely: the plan is one scan + the
    // presentation sort (0.66 → 0.33 s at sf0.1, 2nd-worst >2× row
    // cleared). Bit-equal to the relational form by the expressions'
    // exact-shingle contract (TokenNGramsSpec pins parity).
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        expr("token_ngram_stats(text, 2)").as("st"),
        expr("token_ngram_distinct(text, 2)").cast("long").as("n_distinct"))
      .select(col("doc_id"), col("st.n_grams").as("n_grams"),
        col("n_distinct"), col("st.n_top").as("top_count"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"), col("top_count"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"), 6)
          .as("dup_frac"),
        round(col("top_count").cast("double") / col("n_grams").cast("double"), 6)
          .as("top_frac"))
      .orderBy("doc_id")
  }

  /** Token-distribution Shannon entropy per language slice — the
    * corpus-diversity diagnostic (low entropy ⇒ repetitive/templated
    * slice; evenness = H/ln(types) compares slices of different
    * vocabulary sizes). Uses the identity H = ln N − (Σ c·ln c)/N so
    * everything distributes: one corpus scan → (lang, token) counts
    * with map-side partial, per-term ln(c) quantized round(·,9) →
    * DECIMAL (the `q_lm_perplexity`/`q_bm25_topk` discipline) so the
    * cross-term reduction is exact and order-free; the two outer ln's
    * are single fixed-shape double ops absorbed by the final
    * round(·,6).
    */
  val qEntropy = DeclaredQuery(
    "q_entropy",
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      |c AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
      |agg AS (SELECT lang,
      |               CAST(sum(c) AS BIGINT) AS n_tokens,
      |               CAST(count(*) AS BIGINT) AS n_types,
      |               sum(CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))
      |                   * CAST(c AS DECIMAL(12,0))) AS s
      |        FROM c GROUP BY 1)
      |SELECT lang, n_tokens, n_types,
      |  round(ln(CAST(n_tokens AS DOUBLE)) - CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS entropy,
      |  round(CASE WHEN n_types <= 1 THEN 1.0
      |             ELSE (ln(CAST(n_tokens AS DOUBLE)) - CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE))
      |                  / ln(CAST(n_types AS DOUBLE)) END, 6) AS evenness
      |FROM agg ORDER BY lang""".stripMargin) { (s, d) =>
    val h = log(col("n_tokens").cast("double")) -
      col("s").cast("double") / col("n_tokens").cast("double")
    Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(
        sum("c").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        sum(round(log(col("c").cast("double")), 9).cast("decimal(18,9)")
          * col("c").cast("decimal(12,0)")).as("s"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        round(h, 6).as("entropy"),
        // n_types = 1 degeneracy (round-14 review): H = 0 and
        // Hmax = ln(1) = 0, and the engines disagree on 0.0/0.0
        // (Spark IEEE NaN, DuckDB NULL) — a one-type slice is
        // trivially uniform over its support, so evenness pins to 1.0
        // identically in both
        round(when(col("n_types") <= 1, lit(1.0))
          .otherwise(h / log(col("n_types").cast("double"))), 6)
          .as("evenness"))
      .orderBy("lang")
  }

  val all: Seq[DeclaredQuery] = Seq(qLangId, qQuality, qBpeTokens, qCharNgrams, qQualityClassifier,
    qGopherRepetition, qEntropy)
}
