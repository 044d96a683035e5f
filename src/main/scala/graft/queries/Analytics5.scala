package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 statistics batch 3: time-series autocorrelation, the
  * two-sample Kolmogorov–Smirnov distance, and PMI collocation mining
  * — completing the monitoring/experimentation/corpus-analysis
  * toolbox started in Analytics3/4.
  *
  * Same exactness rules: order-free exact aggregates (DECIMAL/LONG),
  * floating point only in fixed-shape formulas on aggregated rows
  * (shared as literal SQL text with the oracle where multi-stage),
  * every float output round(·, k). Two queries here push the
  * discipline further: `q_ks_test`'s max-deviation search runs
  * entirely in INTEGER arithmetic (cross-multiplied CDF numerators),
  * and `q_autocorrelation` reduces a 7-lag ACF to 25 exact decimal
  * sums before any division.
  */
object Analytics5 {

  /** Lag-1..7 autocorrelation of daily revenue per return flag — the
    * seasonality/trend diagnostic behind forecast monitoring ("does
    * yesterday predict today?"). Lags are over the OBSERVED daily
    * sequence (the equally-spaced convention; calendar gap fill is
    * `q_interpolate`'s job). The ACF at lag k expands to
    * (Σx·x₋ₖ − m·Σ'x − m·Σ'x₋ₖ + (n−k)m²) / (Σx² − n·m²) with m the
    * full-series mean and Σ' over the lag-complete suffix — every Σ
    * an exact DECIMAL aggregate from ONE window pass (7 lag columns
    * share one sort), every division deferred to the final per-flag
    * row. The formula text is shared verbatim with the oracle
    * (selectExpr), so the IEEE op order is identical by construction.
    */
  val qAutocorrelation: DeclaredQuery = {
    val finals = Seq("l_returnflag", "n") ++ (1 to 7).map { k =>
      s"""round((CAST(sxy$k AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sa$k AS DOUBLE)
         |  - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sb$k AS DOUBLE)
         |  + (CAST(n AS DOUBLE) - $k.0) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |    * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
         |  / (CAST(sxx AS DOUBLE)
         |     - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS acf$k""".stripMargin
    }
    val lagSums = (1 to 7).flatMap { k =>
      Seq(
        s"CAST(sum(CAST(x * x$k AS DECIMAL(30,4))) AS DECIMAL(38,4)) AS sxy$k",
        s"CAST(sum(CASE WHEN x$k IS NOT NULL THEN x END) AS DECIMAL(24,2)) AS sa$k",
        s"CAST(sum(x$k) AS DECIMAL(24,2)) AS sb$k")
    }
    DeclaredQuery(
      "q_autocorrelation",
      s"""WITH rev AS (
         |  SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
         |         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS x
         |  FROM lineitem GROUP BY 1, 2),
         |lagged AS (
         |  SELECT l_returnflag, x,
         |         ${(1 to 7).map(k =>
              s"lag(x, $k) OVER (PARTITION BY l_returnflag ORDER BY day) AS x$k")
              .mkString(", ")}
         |  FROM rev),
         |agg AS (
         |  SELECT l_returnflag,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS DECIMAL(24,2)) AS sx,
         |    CAST(sum(CAST(x * x AS DECIMAL(30,4))) AS DECIMAL(38,4)) AS sxx,
         |    ${lagSums.mkString(",\n    ")}
         |  FROM lagged GROUP BY 1)
         |SELECT ${finals.mkString(",\n  ")}
         |FROM agg ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_shipdate").cast("date").as("day"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)"))
          .cast("decimal(14,2)").as("x"))
      val w = Window.partitionBy("l_returnflag").orderBy("day")
      val lagged = (1 to 7).foldLeft(rev) { (df, k) =>
        df.withColumn(s"x$k", lag(col("x"), k).over(w))
      }
      val aggCols = Seq(
        count(lit(1)).cast("long").as("n"),
        sum("x").cast("decimal(24,2)").as("sx"),
        sum(expr("CAST(x * x AS DECIMAL(30,4))")).cast("decimal(38,4)").as("sxx")) ++
        lagSums.map(expr)
      lagged.groupBy("l_returnflag")
        .agg(aggCols.head, aggCols.tail: _*)
        .selectExpr(finals: _*)
        .orderBy("l_returnflag")
    }
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `value`
    * distributions of two event types — the nonparametric "did the
    * distribution shift?" check behind drift monitors and A/B guard
    * rails (Welch compares means; KS sees shape). The empirical-CDF
    * deviation search runs ENTIRELY in integer arithmetic: at each
    * distinct value, |F₁−F₂| = |c₁·N₂ − c₂·N₁| / (N₁·N₂), and the max
    * of the exact BIGINT numerator (≤ 4·10⁸ here, far inside long) is
    * found BEFORE the one double division — no float comparison can
    * flip the argmax between engines. One scan, per-value counts, one
    * cumulative window over the shared value order, a 1-row result.
    */
  val qKsTest = DeclaredQuery(
    "q_ks_test",
    """WITH vc AS (
      |  SELECT CAST(value AS DECIMAL(12,2)) AS v,
      |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS a,
      |    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS b
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY 1),
      |cum AS (
      |  SELECT sum(a) OVER (ORDER BY v) AS ca,
      |         sum(b) OVER (ORDER BY v) AS cb,
      |         sum(a) OVER () AS na, sum(b) OVER () AS nb
      |  FROM vc)
      |SELECT CAST(max(na) AS BIGINT) AS n_click,
      |  CAST(max(nb) AS BIGINT) AS n_view,
      |  CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
      |  round(CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)
      |    / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)), 6) AS ks
      |FROM cum""".stripMargin) { (s, d) =>
    val vc = Tables.events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("value").cast("decimal(12,2)").as("v"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("b"))
    val byV = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    // the single-partition window runs over the per-VALUE counts (a
    // 2-decimal-quantized domain, thousands of rows at any sf), never
    // the raw fact — the same post-aggregate-window shape as Benford
    vc.select(
        sum("a").over(byV).as("ca"), sum("b").over(byV).as("cb"),
        sum("a").over(all).as("na"), sum("b").over(all).as("nb"))
      .agg(
        max("na").cast("long").as("n_click"),
        max("nb").cast("long").as("n_view"),
        max(abs(col("ca") * col("nb") - col("cb") * col("na")))
          .cast("long").as("d_num"),
        round(max(abs(col("ca") * col("nb") - col("cb") * col("na")))
          .cast("double")
          / (max("na").cast("double") * max("nb").cast("double")), 6).as("ks"))
  }

  /** PMI collocation mining: the top token bigrams by pointwise mutual
    * information ln(N·c_xy / (c_x·c_y)) with margins taken over bigram
    * first/second positions — the corpus-linguistics op behind phrase
    * detection and tokenizer-merge diagnostics. Bigrams come from
    * ARRAY INDEXING over the split-token array (toks[i], toks[i+1]) —
    * in-task fanout, no self-join, no window; margins and N are
    * aggregates OF the bigram relation, so the corpus is scanned once.
    * Support floor c_xy ≥ 5 keeps the ln argument's numerator stable
    * and the result non-vacuous at sf0.001.
    *
    * Ranking is by the EXACT RATIONAL cxy·nn/(cx·cy), not its log: ln
    * is monotone, so the top-25 set and order are identical by
    * construction, but the rational is one IEEE division of
    * exactly-representable BIGINT products (≤ ~10¹² here, far under
    * 2⁵³) — bit-identical in every engine, where round(ln(·),9) rode a
    * last-ulp JVM-vs-libm `log` difference that could flip the 9-dp
    * quantization at the cut (the round-9 driver red). Ties in the
    * rational break by the words themselves, exactly in both engines.
    * The emitted pmi is demoted to round(·,6) (the q_ks_test
    * discipline): a 1-ulp ln difference flips a 6-dp rounding only
    * within ~1e-15 of a grid point — LnBoundaryMarginSpec asserts the
    * realized margins. Emitted as DOUBLE, never DECIMAL: the driver's
    * hasher encodes DuckDB DECIMAL cells differently from DOUBLE even
    * when values are equal (the round-9/10 red was exactly a
    * DECIMAL(18,6) final column), so gated outputs must stay on
    * hash-portable types — OutputTypeLintSpec enforces this repo-wide.
    */
  val qPmi = DeclaredQuery(
    "q_pmi",
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS ts FROM documents),
      |bg AS (
      |  SELECT ts[i] AS w1, ts[i + 1] AS w2
      |  FROM toks, LATERAL (
      |    SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
      |c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy
      |      FROM bg GROUP BY 1, 2),
      |m1 AS (SELECT w1, CAST(sum(cxy) AS BIGINT) AS cx FROM c GROUP BY 1),
      |m2 AS (SELECT w2, CAST(sum(cxy) AS BIGINT) AS cy FROM c GROUP BY 1),
      |n AS (SELECT CAST(sum(cxy) AS BIGINT) AS nn FROM c)
      |SELECT w1, w2, cxy,
      |  round(ln(CAST(cxy * nn AS DOUBLE)
      |    / CAST(cx * cy AS DOUBLE)), 6) AS pmi
      |FROM c JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN n
      |WHERE cxy >= 5
      |ORDER BY CAST(cxy * nn AS DOUBLE) / CAST(cx * cy AS DOUBLE) DESC,
      |  w1, w2
      |LIMIT 25""".stripMargin) { (s, d) =>
    val bg = Tables.documents(s, d)
      .select(split(col("text"), " ").as("ts"))
      .select(explode(expr(
        "transform(slice(ts, 1, size(ts) - 1), (x, i) -> struct(x AS w1, ts[i + 1] AS w2))"))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
    val c = bg.groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("cxy"))
      .localCheckpoint() // 4 consumers: pairs, two margins, the total
    val m1 = c.groupBy("w1").agg(sum("cxy").cast("long").as("cx"))
    val m2 = c.groupBy("w2").agg(sum("cxy").cast("long").as("cy"))
    val n = c.agg(sum("cxy").cast("long").as("nn"))
    // BIGINT products first, one cast, one division — the ranking key
    // r is the same double in Spark and DuckDB (exact operands, IEEE
    // division); ln only decorates the already-selected rows.
    val r = (col("cxy") * col("nn")).cast("double") /
      (col("cx") * col("cy")).cast("double")
    c.filter(col("cxy") >= 5)
      .join(m1, Seq("w1")).join(m2, Seq("w2")).crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("cxy"),
        round(log(r), 6).as("pmi"),
        r.as("_r"))
      .orderBy(col("_r").desc, col("w1"), col("w2"))
      .limit(25)
      .drop("_r")
  }

  /** Population Stability Index — THE production ML-monitoring drift
    * metric: each day's `value` distribution vs the first week pooled
    * as baseline, PSI = Σ_bins (p−q)·ln(p/q). Binning is INTEGER
    * arithmetic end to end (exact 2-decimal cents, bin = cents/2800 —
    * no float floor near a boundary can disagree between engines);
    * Laplace smoothing (c+1)/(n+B) over the GLOBAL bin universe keeps
    * empty bins defined, with the day×bin grid built like the chi²
    * contingency grid (cross join of tiny margins, left join counts).
    * Each bin's term is quantized round(·,9)→DECIMAL before the
    * per-day sum, so the reduction is exact and order-free; the ln
    * ratio is computed from one division of exact BIGINT products.
    * One fact scan; everything after is |days|·|bins| rows.
    */
  val qPsiDrift = DeclaredQuery(
    "q_psi_drift",
    """WITH b AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           // 2800 AS bin,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |bins AS (SELECT DISTINCT bin FROM b),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS nbins FROM bins),
      |days AS (SELECT day, CAST(sum(c) AS BIGINT) AS nd FROM b GROUP BY 1),
      |base AS (
      |  SELECT bin, CAST(sum(c) AS BIGINT) AS cb
      |  FROM b WHERE day < DATE '2024-01-08' GROUP BY 1),
      |basen AS (SELECT CAST(sum(cb) AS BIGINT) AS nbase FROM base),
      |grid AS (
      |  SELECT d.day, d.nd, bins.bin, nb.nbins, basen.nbase,
      |         coalesce(b.c, 0) AS c, coalesce(base.cb, 0) AS cb
      |  FROM days d CROSS JOIN bins CROSS JOIN nb CROSS JOIN basen
      |  LEFT JOIN b ON b.day = d.day AND b.bin = bins.bin
      |  LEFT JOIN base ON base.bin = bins.bin
      |  WHERE d.day >= DATE '2024-01-08'),
      |terms AS (
      |  SELECT day,
      |    CAST(round(
      |      (CAST(c + 1 AS DOUBLE) / CAST(nd + nbins AS DOUBLE)
      |       - CAST(cb + 1 AS DOUBLE) / CAST(nbase + nbins AS DOUBLE))
      |      * ln(CAST((c + 1) * (nbase + nbins) AS DOUBLE)
      |           / CAST((cb + 1) * (nd + nbins) AS DOUBLE)), 9)
      |      AS DECIMAL(28,9)) AS term
      |  FROM grid)
      |SELECT day, round(CAST(sum(term) AS DOUBLE), 6) AS psi
      |FROM terms GROUP BY day
      |ORDER BY day""".stripMargin) { (s, d) =>
    psiFromCounts(Tables.events(s, d)
      .groupBy(
        date_trunc("day", col("ts")).cast("date").as("day"),
        // integer division on both sides (Spark DIV ≡ DuckDB // for
        // the nonnegative cents here; `/` would be float division
        // with engine-divergent long casts: Spark truncates, DuckDB
        // rounds)
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 2800")
          .as("bin"))
      .agg(count(lit(1)).cast("long").as("c")))
  }

  /** PSI read-time scoring over a (day, bin, c) counter relation —
    * shared by the batch query and its streaming twin (the
    * incremental-aggregation / read-time-analytics split of
    * `q_stream_anomaly_hours`: the counters are what a serving store
    * maintains; the drift score is computed over the tiny counter
    * space at read time).
    */
  def psiFromCounts(counts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val b = counts
      .localCheckpoint() // 4 consumers: bins, day totals, baseline, grid probe
    val bins = b.select("bin").distinct()
    val nb = bins.agg(count(lit(1)).cast("long").as("nbins"))
    val days = b.groupBy("day").agg(sum("c").cast("long").as("nd"))
    val cutoff = lit("2024-01-08").cast("date")
    val base = b.filter(col("day") < cutoff)
      .groupBy("bin").agg(sum("c").cast("long").as("cb"))
    val basen = base.agg(sum("cb").cast("long").as("nbase"))
    val grid = days.filter(col("day") >= cutoff)
      .crossJoin(broadcast(bins)).crossJoin(broadcast(nb))
      .crossJoin(broadcast(basen))
      .join(b, Seq("day", "bin"), "left")
      .join(broadcast(base), Seq("bin"), "left")
      .select(col("day"), col("nd"), col("nbins"), col("nbase"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    grid
      .select(col("day"),
        round(
          ((col("c") + 1).cast("double") / (col("nd") + col("nbins")).cast("double")
            - (col("cb") + 1).cast("double") / (col("nbase") + col("nbins")).cast("double"))
          * log(((col("c") + 1) * (col("nbase") + col("nbins"))).cast("double")
                / ((col("cb") + 1) * (col("nd") + col("nbins"))).cast("double")), 9)
          .cast("decimal(28,9)").as("term"))
      .groupBy("day")
      .agg(round(sum("term").cast("double"), 6).as("psi"))
      .orderBy("day")
  }

  val all: Seq[DeclaredQuery] = Seq(qAutocorrelation, qKsTest, qPmi, qPsiDrift)
}
