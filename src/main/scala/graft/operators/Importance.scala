package graft.operators

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-shaped importance weighting for data selection (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling" — public paper): score every raw document by how much
  * its hashed n-gram distribution looks like a TARGET slice (here the
  * `lang = 'en'` documents, standing in for "wiki+books-like"), then
  * keep the top-weighted fraction of the mixture. The published
  * estimator is two bag-of-hashed-ngrams unigram models and a per-doc
  * sum of log-likelihood ratios — exactly two aggregates and one
  * broadcast join, which is why it runs at 100 TB where a learned
  * scorer would need a forward pass per doc.
  *
  * Determinism/oracle design (the [[graft.queries.Pipeline]] md5
  * pattern): the feature hash is `substr(md5(token), 1, hexChars)` —
  * identical hex in Spark and DuckDB — so bucket ids match engines
  * exactly; the per-bucket log-ratio is quantized to DECIMAL(18,9)
  * (one `ln` per BUCKET, never per row, so float noise cannot vary
  * with data order), and per-doc weights are DECIMAL sums — exact,
  * associative, partition-order-independent. The whole scoring path
  * is therefore value-stable under repartitioning, which the spec
  * asserts and the DuckDB hash gate (`q_dsir_weights`) re-checks
  * end-to-end.
  *
  * Scale shape: pass 1 aggregates gram instances into at most
  * 16^hexChars buckets (256 at hexChars=2 — the same bucket space the
  * smoothing pseudo-count bSpace uses) with map-side partial counts —
  * the shuffle moves O(buckets × tasks) rows, not O(corpus); the
  * smoothed log-ratio table is a few-KB broadcast; pass 2 re-scans
  * grams, joins the broadcast, and partial-aggregates per doc_id.
  * No shuffle ever carries more than one row per (doc, partition).
  * The two corpus scans are inherent to the method (estimate the
  * distributions, then score against them) — the bucket table is the
  * only state between them, so the passes pipeline cleanly and the
  * model can be persisted and reused across drops like the IVF/PQ
  * artifacts.
  */
object Importance {

  /** Tokenize to (doc_id, extra..., b) hashed-unigram bucket rows.
    * Whitespace tokens through the same `substr(md5(w), 1, n)` bucket
    * id the oracle replays; empty tokens (leading/trailing runs)
    * filtered identically on both sides.
    */
  private def gramBuckets(docs: DataFrame, hexChars: Int,
      carry: Seq[String] = Seq("lang")): DataFrame = {
    val keep = ("doc_id" +: carry).distinct.map(col)
    docs
      .select(keep :+ explode(split(col("text"), "\\s+")).as("w"): _*)
      .filter(length(col("w")) > 0)
      .select(keep :+ substring(md5(col("w")), 1, hexChars).as("b"): _*)
  }

  /** The smoothed per-bucket log-ratio relation (b, r_cnt, t_cnt,
    * lam) — the DSIR "model":
    * λ_b = round(ln( ((t_b+1)(R+B)) / ((r_b+1)(T+B)) ), 9) as
    * DECIMAL(18,9), where t_b/r_b are target/raw instance counts in
    * bucket b, T/R their totals, B the bucket-space size (the fixed
    * smoothing pseudo-count — 16^hexChars regardless of how many
    * buckets materialize). The single-ln-of-one-rational form keeps
    * every intermediate exact in doubles (counts ≪ 2^53), so the only
    * transcendental is one correctly-rounded `ln` per bucket,
    * quantized before it ever meets row data.
    *
    * Totals come from a window over the ≤16^hexChars-row bucket
    * table, NOT a separate aggregate of the gram stream, which would
    * re-derive the whole gram subtree and pay a third corpus scan
    * (the window's single-partition exchange moves 256 rows, nothing).
    */
  private[graft] def ratioTable(docs: DataFrame, targetPred: Column,
      hexChars: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bSpace = math.pow(16.0, hexChars.toDouble)
    val bs = gramBuckets(docs, hexChars).groupBy("b").agg(
      count(lit(1)).as("r_cnt"),
      count(when(targetPred, 1)).as("t_cnt"))
    val winAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bs.select(col("b"), col("r_cnt"), col("t_cnt"),
        sum("r_cnt").over(winAll).as("r_tot"),
        sum("t_cnt").over(winAll).as("t_tot"))
      .select(col("b"), col("r_cnt"), col("t_cnt"),
        round(log(((col("t_cnt") + lit(1.0)) * (col("r_tot") + lit(bSpace))) /
                  ((col("r_cnt") + lit(1.0)) * (col("t_tot") + lit(bSpace)))), 9)
          .cast("decimal(18,9)").as("lam"))
  }

  /** Per-doc DSIR importance weights — Σ over the doc's gram
    * instances of [[ratioTable]]'s quantized λ, as an exact decimal
    * sum. Returns (doc_id, carryCols..., n_grams, weight: double).
    * `carryCols`: extra per-doc columns (functionally dependent on
    * doc_id, e.g. `lang`) widened into the scoring groupBy key — same
    * groups, no extra shuffle, saves the doc_id-keyed join a caller
    * would otherwise pay to get them back.
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
      hexChars: Int = 2, carryCols: Seq[String] = Nil): DataFrame = {
    val lam = ratioTable(docs, targetPred, hexChars).select("b", "lam")
    gramBuckets(docs, hexChars, carryCols).join(broadcast(lam), "b")
      .groupBy("doc_id", carryCols: _*)
      .agg(count(lit(1)).as("n_grams"),
        sum(col("lam")).cast("decimal(38,9)").cast("double").as("weight"))
  }

  /** The collected ratio model — the reusable artifact. At most
    * 16^hexChars entries (4 KB at hexChars=2), so unlike the IVF/PQ
    * relations it collects to the driver and travels as a LITERAL in
    * the scoring expression; a production pipeline persists the
    * four-column [[ratioTable]] parquet alongside it the same way.
    * `default` is the smoothed log-ratio of a bucket unseen at train
    * time (t=0, r=0), derived through the identical round-then-
    * quantize chain so drift-scoring stays engine-reproducible.
    */
  case class RatioModel(hexChars: Int,
      lambda: Map[String, java.math.BigDecimal],
      default: java.math.BigDecimal)

  def trainRatioModel(docs: DataFrame, targetPred: Column,
      hexChars: Int = 2): RatioModel = {
    val rows = ratioTable(docs, targetPred, hexChars)
      .select("b", "r_cnt", "t_cnt", "lam").collect()
    val lambda = rows.map(r => r.getString(0) -> r.getDecimal(3)).toMap
    val bSpace = math.pow(16.0, hexChars.toDouble)
    val rTot = rows.map(_.getLong(1)).sum.toDouble
    val tTot = rows.map(_.getLong(2)).sum.toDouble
    // replicate round(log(...), 9).cast(decimal(18,9)) exactly:
    // Round = BigDecimal.valueOf(d).setScale(9, HALF_UP).doubleValue,
    // then the decimal cast re-quantizes that double at scale 9
    val raw = math.log((rTot + bSpace) / (tTot + bSpace))
    val r9 = java.math.BigDecimal.valueOf(raw)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val default = java.math.BigDecimal.valueOf(r9)
      .setScale(9, java.math.RoundingMode.HALF_UP)
    RatioModel(hexChars, lambda, default)
  }

  /** Train-once cache per (corpus dir, target) — the cachedIvfIndex
    * pattern; racing trains are deterministic so first-put wins.
    */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, RatioModel]()

  def cachedRatioModel(docs: DataFrame, targetPred: Column,
      cacheKey: String, hexChars: Int = 2): RatioModel =
    graft.Memo.memo(modelCache, cacheKey)(
      trainRatioModel(docs, targetPred, hexChars))

  /** Stateless fused scoring against a trained model: (n_grams,
    * weight) columns over `text`, with the λ table as a constant map
    * literal — one `aggregate` HOF traversal per row, no explode, no
    * join, no shuffle, NO state. This is the score-many production
    * path (and the streaming form: scoring new drops is a pure
    * projection over a train-once artifact), exactly equal to the
    * relational pipeline because both sum the same DECIMAL(18,9)
    * quantized λ values (spec-asserted).
    */
  def scoreColumns(model: RatioModel): (Column, Column) = {
    val toks = filter(split(col("text"), "\\s+"),
      w => length(w) > lit(0))
    val lamMap =
      if (model.lambda.isEmpty)
        map().cast("map<string,decimal(18,9)>")
      else
        map(model.lambda.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          Seq(lit(k), lit(v).cast("decimal(18,9)")) }: _*)
    val defaultLam = lit(model.default).cast("decimal(18,9)")
    // accumulator width matters: at (38,9) the `+` promotes past 38
    // digits and Spark sheds the 9th scale digit to fit — silently a
    // scale-8 sum. (27,9)+(18,9) promotes to (28,9) — still exact —
    // and the re-cast keeps the accumulator type stable; |weight|
    // can't approach 1e18 so the narrower precision never overflows
    // try_element_at: states the intended missing-key-is-NULL contract
    // in the operator name. (Map element_at ALSO returns NULL for a
    // missing key under Spark ≥3.4 ANSI — SPARK-40066; only ARRAY
    // index access throws — so this is clarity, not a crash fix; the
    // unseen-bucket spec pins the behavior either way.)
    val weight = aggregate(toks,
        lit(java.math.BigDecimal.ZERO).cast("decimal(27,9)"),
        (acc, w) => (acc + coalesce(
          try_element_at(lamMap, substring(md5(w), 1, model.hexChars)),
          defaultLam)).cast("decimal(27,9)"))
      .cast("double")
    (size(toks).cast("long"), weight)
  }

  /** Hash-gated declared query: top-50 docs by importance weight for
    * the `lang = 'en'` target slice (weight desc, doc_id tiebreak —
    * the deterministic τ→0 limit of the paper's Gumbel-top-k resample;
    * production selection would keep a weight-ranked fraction per
    * mixture slice the same way `q_source_cap` caps per-source).
    * The oracle replays tokenization, bucketing, smoothing, decimal
    * quantization, and the decimal sum verbatim, so bucket ids, λ
    * values, weights, and the final ranking are all value-checked.
    */
  val qDsirWeights = DeclaredQuery(
    "q_dsir_weights",
    """WITH g AS (
      |  SELECT doc_id, lang, substr(md5(w), 1, 2) AS b
      |  FROM (SELECT doc_id, lang,
      |               unnest(string_split_regex(text, '\s+')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0),
      |bs AS (
      |  SELECT b, count(*) AS r_cnt,
      |         count(*) FILTER (WHERE lang = 'en') AS t_cnt
      |  FROM g GROUP BY b),
      |tot AS (SELECT sum(r_cnt) AS r_tot, sum(t_cnt) AS t_tot FROM bs),
      |lam AS (
      |  SELECT b,
      |         CAST(round(ln(((t_cnt + 1.0) * (r_tot + 256.0)) /
      |                       ((r_cnt + 1.0) * (t_tot + 256.0))), 9)
      |              AS DECIMAL(18,9)) AS lam
      |  FROM bs, tot)
      |SELECT g.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_grams,
      |       CAST(CAST(sum(lam.lam) AS DECIMAL(38,9)) AS DOUBLE) AS weight
      |FROM g JOIN lam ON g.b = lam.b
      |GROUP BY g.doc_id
      |ORDER BY weight DESC, doc_id
      |LIMIT 50""".stripMargin) { (s, d) =>
    importanceWeights(Tables.documents(s, d), col("lang") === "en")
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(50)
  }

  /** The resampling step itself: keep the top 20 % of each language
    * slice by importance weight (weight desc, doc_id tiebreak — the
    * deterministic limit of the paper's Gumbel sampling; a per-slice
    * FRACTION rather than a fixed cap because the published method
    * selects to a token budget per mixture slice). `lang` rides the
    * scoring groupBy key (functionally dependent on doc_id — same
    * groups, no join-back), and the rank and the slice size come from
    * TWO window functions over the SAME `lang` partitioning, so one
    * exchange serves both (PlanSpec asserts the single
    * hashpartitioning(lang) exchange). Fully value-gated: the oracle
    * replays weights, ranks, slice counts, and the ceil cutoff.
    */
  /** The per-lang top-`frac` selection relation (lang, doc_id, weight,
    * rk) — q_dsir_select's body, parameterized so the shard drop
    * composes the identical membership. Rank and slice size are TWO
    * windows over the SAME lang partitioning → one exchange serves
    * both (PlanSpec asserts it on q_dsir_select).
    */
  private[graft] def topFractionByLang(docs: DataFrame, targetPred: Column,
      frac: Double, hexChars: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Window.partitionBy("lang")
    importanceWeights(docs, targetPred, hexChars, carryCols = Seq("lang"))
      .select(col("lang"), col("doc_id"), col("weight"))
      .withColumn("rk", row_number()
        .over(part.orderBy(col("weight").desc, col("doc_id"))).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(part))
      .filter(col("rk") <= ceil(lit(frac) * col("n_lang")))
      .select(col("lang"), col("doc_id"), col("weight"), col("rk"))
  }

  /** DSIR selection composed back onto the full document rows: the
    * selected ids (a doc_id/weight/rk relation, ~frac of the corpus)
    * equi-join the corpus on doc_id to recover text + metadata. A join
    * back, NOT `carryCols = text`: carry columns widen the per-GRAM
    * rows, so carrying text would move every document body once per
    * token through the scoring shuffle; the join moves each body once.
    */
  def selectTopFraction(docs: DataFrame, targetPred: Column,
      frac: Double = 0.2, hexChars: Int = 2): DataFrame =
    docs.join(
      topFractionByLang(docs, targetPred, frac, hexChars)
        .select(col("doc_id"), col("weight"), col("rk")),
      "doc_id")

  /** The endgame composition (round-6 verdict stretch #8): DSIR-select
    * the top fraction, then lay the survivors out as
    * `split=…/lang=…/part-*.parquet` training shards
    * ([[graft.sources.ShardWriter]] — content-hash split, partition
    * pruning for the dataloader, bounded rows per file). weight/rk
    * ride along as data columns (training-time curriculum metadata).
    * One declared pipeline: selection membership is deterministic
    * (decimal weights + doc_id tiebreak), the split is a content hash,
    * so re-runs lay out byte-identical shard membership.
    */
  def dsirShardDrop(docs: DataFrame, outDir: String, targetPred: Column,
      frac: Double = 0.2, hexChars: Int = 2,
      maxRecordsPerFile: Int = 100000): Unit =
    graft.sources.ShardWriter.writeShards(
      selectTopFraction(docs, targetPred, frac, hexChars),
      outDir, maxRecordsPerFile)

  /** Drop-once cache per corpus dir (the cachedPqCodes pattern:
    * deterministic artifact, first put wins, loser's dir deleted).
    */
  private val shardsCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def deleteDir(p: String): Unit =
    graft.SparkEnv.deleteDir(p) // one shared impl (round-14 review)

  def cachedDsirShards(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = {
    val cached = shardsCache.get(sfDir)
    if (cached != null) cached
    else {
      val path = graft.SparkEnv.scratchDir(
        s"dsir-shards-${java.lang.Integer.toHexString(sfDir.hashCode)}")
      dsirShardDrop(Tables.documents(spark, sfDir), path, col("lang") === "en")
      val prev = shardsCache.putIfAbsent(sfDir, path)
      if (prev != null) { deleteDir(path); prev } else path
    }
  }

  val qDsirSelect = DeclaredQuery(
    "q_dsir_select",
    """WITH g AS (
      |  SELECT doc_id, lang, substr(md5(w), 1, 2) AS b
      |  FROM (SELECT doc_id, lang,
      |               unnest(string_split_regex(text, '\s+')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0),
      |bs AS (
      |  SELECT b, count(*) AS r_cnt,
      |         count(*) FILTER (WHERE lang = 'en') AS t_cnt
      |  FROM g GROUP BY b),
      |tot AS (SELECT sum(r_cnt) AS r_tot, sum(t_cnt) AS t_tot FROM bs),
      |lam AS (
      |  SELECT b,
      |         CAST(round(ln(((t_cnt + 1.0) * (r_tot + 256.0)) /
      |                       ((r_cnt + 1.0) * (t_tot + 256.0))), 9)
      |              AS DECIMAL(18,9)) AS lam
      |  FROM bs, tot),
      |w AS (
      |  SELECT g.doc_id, g.lang,
      |         CAST(CAST(sum(lam.lam) AS DECIMAL(38,9)) AS DOUBLE) AS weight
      |  FROM g JOIN lam ON g.b = lam.b
      |  GROUP BY g.doc_id, g.lang),
      |sel AS (
      |  SELECT lang, doc_id, weight,
      |         row_number() OVER (PARTITION BY lang
      |                            ORDER BY weight DESC, doc_id) AS rk,
      |         count(*) OVER (PARTITION BY lang) AS n_lang
      |  FROM w)
      |SELECT lang, doc_id, weight, CAST(rk AS BIGINT) AS rk
      |FROM sel
      |WHERE rk <= ceil(0.2 * n_lang)
      |ORDER BY lang, rk""".stripMargin) { (s, d) =>
    topFractionByLang(Tables.documents(s, d), col("lang") === "en", 0.2)
      .orderBy("lang", "rk")
  }

  /** Hash-gated end-to-end shard drop: [[dsirShardDrop]] runs once per
    * corpus dir (cached artifact), then the query READS THE WRITTEN
    * SHARDS BACK and profiles them per (split, lang). The oracle
    * replays the whole composition — weights, per-lang ranks, the ceil
    * cutoff, the content-hash split thresholds — against the raw
    * tables, so a drift anywhere in select→join-back→split→parquet
    * layout (including partition-column round-tripping) breaks the
    * value gate. Weight sums quantize to DECIMAL(18,9) (exact re-cast
    * of the decimal-born weights) so partition order cannot move the
    * double sum.
    */
  val qDsirShards = DeclaredQuery(
    "q_dsir_shards",
    """WITH g AS (
      |  SELECT doc_id, lang, substr(md5(w), 1, 2) AS b
      |  FROM (SELECT doc_id, lang,
      |               unnest(string_split_regex(text, '\s+')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0),
      |bs AS (
      |  SELECT b, count(*) AS r_cnt,
      |         count(*) FILTER (WHERE lang = 'en') AS t_cnt
      |  FROM g GROUP BY b),
      |tot AS (SELECT sum(r_cnt) AS r_tot, sum(t_cnt) AS t_tot FROM bs),
      |lam AS (
      |  SELECT b,
      |         CAST(round(ln(((t_cnt + 1.0) * (r_tot + 256.0)) /
      |                       ((r_cnt + 1.0) * (t_tot + 256.0))), 9)
      |              AS DECIMAL(18,9)) AS lam
      |  FROM bs, tot),
      |w AS (
      |  SELECT g.doc_id, g.lang,
      |         CAST(CAST(sum(lam.lam) AS DECIMAL(38,9)) AS DOUBLE) AS weight
      |  FROM g JOIN lam ON g.b = lam.b
      |  GROUP BY g.doc_id, g.lang),
      |sel AS (
      |  SELECT lang, doc_id, weight,
      |         row_number() OVER (PARTITION BY lang
      |                            ORDER BY weight DESC, doc_id) AS rk,
      |         count(*) OVER (PARTITION BY lang) AS n_lang
      |  FROM w),
      |kept AS (
      |  SELECT s.lang, s.doc_id, s.weight, d.text
      |  FROM sel s JOIN documents d ON s.doc_id = d.doc_id
      |  WHERE s.rk <= ceil(0.2 * n_lang))
      |SELECT CASE WHEN substr(md5(text), 1, 2) < '05' THEN 'validation'
      |            WHEN substr(md5(text), 1, 2) < '0a' THEN 'test'
      |            ELSE 'train' END AS split,
      |       lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(CAST(sum(CAST(weight AS DECIMAL(18,9)))
      |            AS DECIMAL(38,9)) AS DOUBLE) AS sum_weight
      |FROM kept
      |GROUP BY split, lang
      |ORDER BY split, lang""".stripMargin) { (s, d) =>
    val path = cachedDsirShards(s, d)
    // an empty corpus selects nothing -> the drop writes zero files and
    // parquet can't infer a schema; the profile of an empty shard set
    // is the empty relation with the declared shape
    def hasParquet(f: java.io.File): Boolean = {
      val kids = f.listFiles()
      kids != null && kids.exists(k =>
        (k.isFile && k.getName.endsWith(".parquet")) || hasParquet(k))
    }
    if (!hasParquet(new java.io.File(path))) {
      import org.apache.spark.sql.types._
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("split", StringType), StructField("lang", StringType),
          StructField("n_docs", LongType), StructField("sum_weight", DoubleType))))
    } else
      s.read.parquet(path)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("weight").cast("decimal(18,9)")).cast("decimal(38,9)")
            .cast("double").as("sum_weight"))
        .orderBy("split", "lang")
  }

  val all: Seq[DeclaredQuery] = Seq(qDsirWeights, qDsirSelect, qDsirShards)
}
