package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 breadth: relational reshaping (UNPIVOT, LATERAL), and two
  * closed-form statistics queries (exponentially-weighted moving
  * average, chi-squared independence) built on the repo's exactness
  * discipline — every aggregate order-independent (exact DECIMAL /
  * LONG), floating point confined to a final fixed-shape formula on
  * the aggregated row, rounded to a declared quantum. That discipline
  * is what makes statistics hash-gateable across engines AND
  * deterministic across cluster re-runs — partition-order-dependent
  * double accumulation would be neither.
  */
object Analytics3 {

  /** Native UNPIVOT (wide → long): the inverse of `q_pivot`. Spark's
    * `Dataset.unpivot` plans an `Expand` — each input row fans out to
    * one row per metric IN THE SAME TASK, no shuffle, no generator
    * UDF — and DuckDB's standard `UNPIVOT (value FOR metric IN ...)`
    * replays it. Metrics are cast to a common DOUBLE after exact
    * decimal aggregation (unpivot requires one value type; the casts
    * are exact for these magnitudes).
    */
  val qUnpivot = DeclaredQuery(
    "q_unpivot",
    """SELECT l_returnflag, metric, value
      |FROM (SELECT l_returnflag,
      |        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
      |        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price,
      |        CAST(count(*) AS DOUBLE) AS n_rows
      |      FROM lineitem GROUP BY 1)
      |UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_rows))
      |ORDER BY l_returnflag, metric""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_price"),
        count(lit(1)).cast("double").as("n_rows"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_rows")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  /** Correlated LATERAL join: per-region top-3 customers by account
    * balance, written as the SQL-standard lateral subquery (ORDER BY
    * … LIMIT 3 correlated on the outer region row) in BOTH engines.
    * Spark plans the correlated limit as a per-group window under a
    * LateralJoin decorrelation — semantically per-group top-k
    * (`q_top_types_per_user`'s shape) but exercising the
    * decorrelation path, which ad-hoc SQL users actually write.
    * Determinism: ties on c_acctbal broken by c_custkey in the
    * lateral ORDER BY itself, so the kept set — not just its order —
    * is unique. Region side is 5 rows; at scale the outer side of a
    * lateral top-k should be the SMALL relation (here it is), the
    * inner the fact — the decorrelated plan shuffles the fact once
    * by the correlation key.
    */
  val qLateralTopk = DeclaredQuery(
    "q_lateral_topk",
    """SELECT r.r_name, t.c_custkey, t.c_acctbal
      |FROM region r, LATERAL (
      |  SELECT c.c_custkey, c.c_acctbal
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  ORDER BY c.c_acctbal DESC, c.c_custkey
      |  LIMIT 3) t
      |ORDER BY r.r_name, t.c_acctbal DESC, t.c_custkey""".stripMargin) { (s, d) =>
    val suf = d.replaceAll("[^A-Za-z0-9]", "_")
    Tables.region(s, d).createOrReplaceTempView(s"lat_region_$suf")
    Tables.nation(s, d).createOrReplaceTempView(s"lat_nation_$suf")
    Tables.customer(s, d).createOrReplaceTempView(s"lat_customer_$suf")
    s.sql(
      s"""SELECT r.r_name, t.c_custkey, t.c_acctbal
         |FROM lat_region_$suf r, LATERAL (
         |  SELECT c.c_custkey, c.c_acctbal
         |  FROM lat_customer_$suf c JOIN lat_nation_$suf n
         |    ON c.c_nationkey = n.n_nationkey
         |  WHERE n.n_regionkey = r.r_regionkey
         |  ORDER BY c.c_acctbal DESC, c.c_custkey
         |  LIMIT 3) t
         |ORDER BY r.r_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
  }

  /** Exponentially-weighted moving average of daily revenue per
    * return flag — the standard smoothing every monitoring/forecast
    * pipeline runs. EWMA is a recursion (y_t = αx_t + (1−α)y_{t−1}),
    * which does not distribute; the declared form is the DEPTH-8
    * truncation (α = 0.2 ⇒ weights 0.8^k, k = 0..7, residual mass
    * 0.8^8 ≈ 1.7 %), which turns it into a fixed-shape windowed
    * linear combination — one partition-local window pass, no
    * iteration, no state. Exactness: daily revenue is an exact
    * DECIMAL(18,2) sum; the 8 weights are exact DECIMAL(8,7)
    * literals, so the weighted numerator is EXACT decimal arithmetic
    * (order-free); the single double division by the constant weight
    * mass Σ0.8^k = 4.1611392 is the only float, rounded to 6.
    * Emitted only where all 8 lags exist (a calendar-complete
    * window), so every row's weight mass is the same constant.
    */
  val qEwma = DeclaredQuery(
    "q_ewma",
    """WITH rev AS (
      |  SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
      |  FROM lineitem GROUP BY 1, 2),
      |lagged AS (
      |  SELECT l_returnflag, day, rev,
      |         lag(rev, 1) OVER w AS r1, lag(rev, 2) OVER w AS r2,
      |         lag(rev, 3) OVER w AS r3, lag(rev, 4) OVER w AS r4,
      |         lag(rev, 5) OVER w AS r5, lag(rev, 6) OVER w AS r6,
      |         lag(rev, 7) OVER w AS r7
      |  FROM rev WINDOW w AS (PARTITION BY l_returnflag ORDER BY day))
      |SELECT l_returnflag, day,
      |  round(CAST(rev
      |      + CAST(0.8 AS DECIMAL(8,7)) * r1 + CAST(0.64 AS DECIMAL(8,7)) * r2
      |      + CAST(0.512 AS DECIMAL(8,7)) * r3 + CAST(0.4096 AS DECIMAL(8,7)) * r4
      |      + CAST(0.32768 AS DECIMAL(8,7)) * r5 + CAST(0.262144 AS DECIMAL(8,7)) * r6
      |      + CAST(0.2097152 AS DECIMAL(8,7)) * r7 AS DOUBLE)
      |    / CAST(4.1611392 AS DOUBLE), 6) AS ewma
      |FROM lagged WHERE r7 IS NOT NULL
      |ORDER BY l_returnflag, day""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_shipdate").cast("date").as("day"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)").as("rev"))
    val w = Window.partitionBy("l_returnflag").orderBy("day")
    val lagged = (1 to 7).foldLeft(rev) { (df, k) =>
      df.withColumn(s"r$k", lag(col("rev"), k).over(w))
    }
    // weights as exact DECIMAL literals (0.8^k has exactly k decimal
    // digits — never a binary-float approximation)
    val weighted = (1 to 7).foldLeft(col("rev")) { (acc, k) =>
      acc + expr(s"CAST(${BigDecimal(0.8).pow(k)} AS DECIMAL(8,7))") * col(s"r$k")
    }
    lagged.filter(col("r7").isNotNull)
      .select(col("l_returnflag"), col("day"),
        round(weighted.cast("double") / lit(4.1611392).cast("double"), 6).as("ewma"))
      .orderBy("l_returnflag", "day")
  }

  /** Chi-squared test of independence, lang × source over the corpus —
    * the categorical hypothesis test behind "does document source
    * predict language?" drift checks. The statistic needs the FULL
    * contingency grid (absent cells contribute (0−e)²/e), so the grid
    * is the cross join of the two tiny margin relations (|langs| ×
    * |sources| rows — driver-scale, broadcast) left-joined to
    * observed counts; all counts are exact longs. Per-cell
    * (o−e)²/e is fixed-shape double arithmetic, quantized to
    * DECIMAL(28,9) so the cross-cell reduction is EXACT and
    * order-free — summing raw doubles across cells would be
    * partition-order nondeterministic and unhashable.
    */
  val qChi2 = DeclaredQuery(
    "q_chi2_independence",
    """WITH c AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |l AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rl FROM c GROUP BY 1),
      |s2 AS (SELECT source, CAST(sum(o) AS BIGINT) AS cs FROM c GROUP BY 1),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM c),
      |cell AS (
      |  SELECT l.lang, s2.source,
      |         CAST(coalesce(c.o, 0) AS DOUBLE) AS o,
      |         CAST(l.rl AS DOUBLE) * CAST(s2.cs AS DOUBLE) / CAST(n.nn AS DOUBLE) AS e
      |  FROM l CROSS JOIN s2 CROSS JOIN n
      |  LEFT JOIN c ON c.lang = l.lang AND c.source = s2.source)
      |SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |  CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
      |  CAST(sum(CAST(round((o - e) * (o - e) / e, 9) AS DECIMAL(28,9))) AS DOUBLE) AS chi2
      |FROM cell""".stripMargin) { (s, d) =>
    val c = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      .localCheckpoint() // 3 consumers (margins ×2 + observed probe); tiny
    val l = c.groupBy("lang").agg(sum("o").cast("long").as("rl"))
    val s2 = c.groupBy("source").agg(sum("o").cast("long").as("cs"))
    val n = c.agg(sum("o").cast("long").as("nn"))
    val e = col("rl").cast("double") * col("cs").cast("double") / col("nn").cast("double")
    broadcast(l).crossJoin(broadcast(s2)).crossJoin(broadcast(n))
      .join(c.withColumnRenamed("o", "o_obs"), Seq("lang", "source"), "left")
      .select(col("lang"), col("source"),
        coalesce(col("o_obs"), lit(0L)).cast("double").as("o"),
        e.as("e"))
      .agg(
        count(lit(1)).cast("long").as("n_cells"),
        ((countDistinct(col("lang")) - 1) * (countDistinct(col("source")) - 1))
          .cast("long").as("dof"),
        sum(round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 9)
          .cast("decimal(28,9)")).cast("double").as("chi2"))
  }

  /** Rolling exact median (7-day ROWS frame) of daily revenue per
    * return flag — the robust-location counterpart of the rolling
    * means elsewhere (outlier-insensitive smoothing). Spark's exact
    * `percentile` runs as a WINDOW aggregate over the ROWS frame; the
    * frame is a FIXED 7 rows (emitted only where complete, rn ≥ 7),
    * so the median is the 4th order statistic of 7 exact
    * DECIMAL(18,2) values — no interpolation, and its double image is
    * exact at these magnitudes. At scale the frame recomputes per row
    * over ≤7 values inside one partition-local window pass — never a
    * self-join. DuckDB replays via `quantile_cont` over the identical
    * frame.
    */
  val qRollingMedian = DeclaredQuery(
    "q_rolling_median",
    """WITH rev AS (
      |  SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
      |  FROM lineitem GROUP BY 1, 2),
      |f AS (
      |  SELECT l_returnflag, day,
      |         quantile_cont(CAST(rev AS DOUBLE), 0.5)
      |           OVER (PARTITION BY l_returnflag ORDER BY day
      |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med,
      |         row_number() OVER (PARTITION BY l_returnflag ORDER BY day) AS rn
      |  FROM rev)
      |SELECT l_returnflag, day, round(med, 6) AS rolling_median
      |FROM f WHERE rn >= 7
      |ORDER BY l_returnflag, day""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_shipdate").cast("date").as("day"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)").as("rev"))
    val frame = Window.partitionBy("l_returnflag").orderBy("day")
      .rowsBetween(-6, Window.currentRow)
    val rank = Window.partitionBy("l_returnflag").orderBy("day")
    rev.select(col("l_returnflag"), col("day"),
        expr("percentile(CAST(rev AS DOUBLE), 0.5)").over(frame).as("med"),
        row_number().over(rank).as("rn"))
      .filter(col("rn") >= 7)
      .select(col("l_returnflag"), col("day"),
        round(col("med"), 6).as("rolling_median"))
      .orderBy("l_returnflag", "day")
  }

  /** Revenue-concentration metrics per market segment: Gini
    * coefficient and Herfindahl–Hirschman index of per-customer
    * revenue — the concentration diagnostics corpus curation runs
    * over source/domain token mass (`q_source_cap`'s motivating
    * statistic) and analytics runs over customer revenue. Both reduce
    * to exact sufficient statistics: HHI = Σx²/(Σx)² needs only two
    * order-free decimal sums; Gini's rank-weighted form
    * (2Σi·x)/(n·Σx) − (n+1)/n needs one ascending rank per segment
    * (ONE window pass; ties broken by key, though Σi·x is
    * tie-order-invariant) then a plain aggregate. x is cast to
    * DECIMAL(12,2) before squaring so products stay far inside
    * precision 38 (the D10 discipline); the final formulas are
    * fixed-shape double arithmetic on exact aggregates, round(·,6).
    */
  val qConcentration = DeclaredQuery(
    "q_concentration",
    """WITH rev AS (
      |  SELECT c.c_mktsegment, c.c_custkey,
      |         CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS x
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT c_mktsegment, x,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY x, c_custkey) AS i
      |  FROM rev),
      |agg AS (
      |  SELECT c_mktsegment,
      |         CAST(count(*) AS BIGINT) AS n,
      |         sum(x) AS sx,
      |         sum(x * x) AS sxx,
      |         sum(CAST(i AS DECIMAL(10,0)) * x) AS six
      |  FROM ranked GROUP BY 1)
      |SELECT c_mktsegment, n,
      |  round(CAST(2 AS DOUBLE) * CAST(six AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
      |      - (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS gini,
      |  round(CAST(sxx AS DOUBLE) / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS hhi
      |FROM agg ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val rev = Tables.customer(s, d).as("c")
      .join(Tables.orders(s, d).as("o"), col("o.o_custkey") === col("c.c_custkey"))
      .groupBy(col("c.c_mktsegment"), col("c.c_custkey"))
      .agg(sum(col("o.o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(12,2)").as("x"))
    val w = Window.partitionBy("c_mktsegment").orderBy("x", "c_custkey")
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    rev.select(col("c_mktsegment"), col("x"), row_number().over(w).as("i"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("i").cast("decimal(10,0)") * col("x")).as("six"))
      .select(col("c_mktsegment"), col("n"),
        round(lit(2).cast("double") * dbl(col("six"))
            / (dbl(col("n")) * dbl(col("sx")))
          - (dbl(col("n")) + lit(1).cast("double")) / dbl(col("n")), 6).as("gini"),
        round(dbl(col("sxx")) / (dbl(col("sx")) * dbl(col("sx"))), 6).as("hhi"))
      .orderBy("c_mktsegment")
  }

  /** Benford first-digit audit of l_extendedprice — the classic
    * data-quality screen for fabricated or truncated numeric columns.
    * The leading digit comes from the DECIMAL's canonical string form
    * (identical rendering both engines — never from log10, whose
    * last-ulp differences across libm implementations could flip a
    * floor at exact powers of ten); the nine Benford expectations are
    * 9-decimal LITERALS in the query text, not computed logs, for the
    * same reason. One scan, a 9-group aggregate, and a 1-row total
    * broadcast via a frameless window.
    */
  val qBenford = DeclaredQuery(
    "q_benford",
    """WITH d AS (
      |  SELECT substring(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS digit
      |  FROM lineitem),
      |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      |t AS (SELECT digit, n, sum(n) OVER () AS total FROM c)
      |SELECT digit, n,
      |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
      |  CAST(CASE digit WHEN '1' THEN 0.301029996 WHEN '2' THEN 0.176091259
      |    WHEN '3' THEN 0.124938737 WHEN '4' THEN 0.096910013
      |    WHEN '5' THEN 0.079181246 WHEN '6' THEN 0.066946790
      |    WHEN '7' THEN 0.057991947 WHEN '8' THEN 0.051152522
      |    WHEN '9' THEN 0.045757491 END AS DOUBLE) AS benford
      |FROM t ORDER BY digit""".stripMargin) { (s, d) =>
    val counts = Tables.lineitem(s, d)
      .select(substring(col("l_extendedprice").cast("decimal(12,2)")
        .cast("string"), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).cast("long").as("n"))
    counts
      .select(col("digit"), col("n"),
        round(col("n").cast("double") /
          sum("n").over(Window.partitionBy()).cast("double"), 6).as("share"),
        expr("""CAST(CASE digit WHEN '1' THEN 0.301029996 WHEN '2' THEN 0.176091259
          WHEN '3' THEN 0.124938737 WHEN '4' THEN 0.096910013
          WHEN '5' THEN 0.079181246 WHEN '6' THEN 0.066946790
          WHEN '7' THEN 0.057991947 WHEN '8' THEN 0.051152522
          WHEN '9' THEN 0.045757491 END AS DOUBLE)""").as("benford"))
      .orderBy("digit")
  }

  val all: Seq[DeclaredQuery] = Seq(qUnpivot, qLateralTopk, qEwma, qChi2,
    qRollingMedian, qConcentration, qBenford)
}
