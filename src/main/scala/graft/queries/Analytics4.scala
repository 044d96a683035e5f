package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 statistics batch 2: robust statistics (MAD, Tukey-fence
  * outliers), a two-sample hypothesis test (Welch's t), and linear
  * gap-fill interpolation — the remaining standard members of the
  * monitoring/data-quality toolbox beside `Analytics3`'s EWMA / chi² /
  * Gini / Benford.
  *
  * Same exactness discipline: aggregates are exact (DECIMAL/LONG,
  * order-free), floating point is confined to fixed-shape formulas on
  * already-aggregated rows, and every float output is round(·, k).
  * Where a formula spans several derived quantities (Welch), the SAME
  * SQL text computes it in both engines — the Spark side evaluates the
  * oracle's formula strings verbatim via selectExpr, so there is no
  * possibility of an operation-order divergence between the declared
  * query and its gate.
  */
object Analytics4 {

  /** Median absolute deviation of document length per language — the
    * robust spread statistic quality pipelines use where stddev is
    * outlier-poisoned (one 10 MB doc should not widen the fence for a
    * whole language slice). n_chars is integral, so the interpolated
    * median lands on 0.5 quanta and every |x − med| on 0.25 quanta —
    * binary-exact doubles in both engines, no rounding ambiguity.
    *
    * Shape: the per-row median comes from a whole-partition window
    * (evaluated once per partition, not per row), and the following
    * groupBy("lang") reuses the window's hash partitioning — ONE scan,
    * ONE shuffle (PlanSpec asserts the single exchange).
    */
  val qMad = DeclaredQuery(
    "q_mad",
    """WITH m AS (
      |  SELECT lang, n_chars,
      |         quantile_cont(CAST(n_chars AS DOUBLE), 0.5)
      |           OVER (PARTITION BY lang) AS med
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(max(med), 6) AS median_chars,
      |  round(quantile_cont(abs(CAST(n_chars AS DOUBLE) - med), 0.5), 6) AS mad
      |FROM m GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("lang")
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars"),
        expr("percentile(CAST(n_chars AS DOUBLE), 0.5)").over(w).as("med"))
      .groupBy("lang")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        round(max(col("med")), 6).as("median_chars"),
        round(expr("percentile(abs(CAST(n_chars AS DOUBLE) - med), 0.5)"), 6)
          .as("mad"))
      .orderBy("lang")
  }

  /** Tukey-fence outlier screen on per-user event counts — the
    * standard "bot detection" / anomalous-account data-quality gate:
    * a user whose event count exceeds Q3 + 1.5·IQR for their event
    * type is flagged. Counts are integers, quartiles land on 0.25
    * quanta and 1.5·IQR on 0.125 quanta — all binary-exact, so the
    * strict `>` fence comparison cannot straddle an ulp between
    * engines. The quartile relation is |event types| rows → broadcast
    * back; the per-user aggregate is one map-side-combinable shuffle
    * of the fact.
    */
  val qIqrOutliers = DeclaredQuery(
    "q_iqr_outliers",
    """WITH uc AS (
      |  SELECT event_type, user_id, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |q AS (
      |  SELECT event_type,
      |         quantile_cont(CAST(n AS DOUBLE), 0.25) AS q1,
      |         quantile_cont(CAST(n AS DOUBLE), 0.75) AS q3
      |  FROM uc GROUP BY 1)
      |SELECT uc.event_type,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  round(max(q.q3 - q.q1), 6) AS iqr,
      |  CAST(count(*) FILTER (
      |    WHERE CAST(n AS DOUBLE) > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT)
      |    AS n_outliers
      |FROM uc JOIN q ON q.event_type = uc.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val uc = Tables.events(s, d)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
      // lazy lineage cut (round-14 review — the qWelch/qInterpolate
      // rule): both the quartile aggregate and the join probe consume
      // uc; without the cut each re-plans the events scan + aggregate
      .localCheckpoint(false)
    val q = uc.groupBy("event_type").agg(
      expr("percentile(CAST(n AS DOUBLE), 0.25)").as("q1"),
      expr("percentile(CAST(n AS DOUBLE), 0.75)").as("q3"))
    uc.join(broadcast(q), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).cast("long").as("n_users"),
        round(max(col("q3") - col("q1")), 6).as("iqr"),
        sum(when(col("n").cast("double") >
          col("q3") + lit(1.5) * (col("q3") - col("q1")), 1L).otherwise(0L))
          .cast("long").as("n_outliers"))
      .orderBy("event_type")
  }

  /** Welch's two-sample t-test, one-vs-rest per event type: does this
    * event type's `value` distribution differ from everything else? —
    * the A/B-test statistic every experimentation pipeline computes.
    * Sufficient statistics only: value is 2-decimal-valued, so
    * CAST(value AS DECIMAL(12,2)) recovers it exactly and (n, Σx, Σx²)
    * are exact order-free decimal aggregates; the complement group's
    * stats are exact decimal SUBTRACTIONS from the grand totals (one
    * extra 1-row aggregate, broadcast) — the whole test costs one
    * corpus scan regardless of group count. The t/dof formulas are
    * THE SAME SQL TEXT in both engines (selectExpr evaluates the
    * oracle's strings), staged so every shared subexpression is
    * named once — identical IEEE operation order by construction.
    */
  val qWelch: DeclaredQuery = {
    // stage 1: per-type vs rest — means and unbiased variances
    val stage1 = Seq(
      "event_type",
      "n1",
      "CAST(nn - n1 AS BIGINT) AS n2",
      "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1",
      "CAST(ss - s1 AS DOUBLE) / CAST(nn - n1 AS DOUBLE) AS m2",
      """(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |  / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1""".stripMargin,
      """(CAST(qq - q1 AS DOUBLE)
        |  - CAST(ss - s1 AS DOUBLE) * CAST(ss - s1 AS DOUBLE)
        |    / CAST(nn - n1 AS DOUBLE))
        |  / (CAST(nn - n1 AS DOUBLE) - 1.0) AS v2""".stripMargin)
    // stage 2: standard error and its per-group components
    val stage2 = Seq(
      "event_type", "n1", "n2", "m1", "m2",
      "v1 / CAST(n1 AS DOUBLE) AS c1",
      "v2 / CAST(n2 AS DOUBLE) AS c2")
    // stage 3: t statistic + Welch–Satterthwaite dof
    val stage3 = Seq(
      "event_type",
      "n1 AS n_group", "n2 AS n_rest",
      "round(m1 - m2, 6) AS mean_diff",
      "round((m1 - m2) / sqrt(c1 + c2), 6) AS t_stat",
      """round((c1 + c2) * (c1 + c2)
        |  / (c1 * c1 / (CAST(n1 AS DOUBLE) - 1.0)
        |     + c2 * c2 / (CAST(n2 AS DOUBLE) - 1.0)), 3) AS welch_dof""".stripMargin)
    DeclaredQuery(
      "q_welch_ttest",
      s"""WITH c AS (
         |  SELECT event_type,
         |    CAST(count(*) AS BIGINT) AS n1,
         |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS s1,
         |    CAST(sum(CAST(
         |      CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))
         |      AS DECIMAL(26,4))) AS DECIMAL(32,4)) AS q1
         |  FROM events GROUP BY 1),
         |g AS (
         |  SELECT CAST(sum(n1) AS BIGINT) AS nn,
         |    CAST(sum(s1) AS DECIMAL(22,2)) AS ss,
         |    CAST(sum(q1) AS DECIMAL(32,4)) AS qq
         |  FROM c),
         |t1 AS (SELECT ${stage1.mkString(", ")} FROM c CROSS JOIN g),
         |t2 AS (SELECT ${stage2.mkString(", ")} FROM t1)
         |SELECT ${stage3.mkString(", ")}
         |FROM t2 ORDER BY event_type""".stripMargin) { (s, d) =>
      val x = col("value").cast("decimal(12,2)")
      val c = Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).cast("long").as("n1"),
          sum(x).cast("decimal(22,2)").as("s1"),
          sum((x * x).cast("decimal(26,4)")).cast("decimal(32,4)").as("q1"))
        .localCheckpoint() // 2 consumers: the rows and their grand total
      val g = c.agg(
        sum("n1").cast("long").as("nn"),
        sum("s1").cast("decimal(22,2)").as("ss"),
        sum("q1").cast("decimal(32,4)").as("qq"))
      c.crossJoin(broadcast(g))
        .selectExpr(stage1: _*)
        .selectExpr(stage2: _*)
        .selectExpr(stage3: _*)
        .orderBy("event_type")
    }
  }

  /** Linear-interpolation gap fill (the TimescaleDB `interpolate` /
    * Pandas `interpolate(method='linear')` op): a deterministically
    * thinned hourly value series per event type (event_id % 29 — the
    * thinning is what makes gaps REAL at every sf; the unthinned
    * series is calendar-dense) is re-gridded onto the full hour spine
    * between each type's first and last observation, and missing
    * hours get v0 + (v1−v0)·Δh/ΔH from the bracketing observations.
    * Carry-forward fill is `q_recursive_cte`'s gap fill; this is the
    * interpolating sibling monitoring dashboards want for rates.
    *
    * Scale: the spine is generated per type from a 1-row-per-type
    * bounds aggregate (sequence + explode — rows ∝ calendar span, not
    * input), the join is on (type, hour), and the bracketing
    * observations come from two frame-bounded window passes over the
    * SAME (type, hour) sort — no self-join, no per-gap expansion.
    * Exactness: observed sums are DECIMAL(14,2); Δh/ΔH are BIGINT
    * hour diffs; the one interpolation formula is fixed-shape IEEE
    * arithmetic, round(·, 6).
    */
  val qInterpolate = DeclaredQuery(
    "q_interpolate",
    """WITH pts AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS v
      |  FROM events WHERE event_id % 29 = 0
      |  GROUP BY 1, 2),
      |bounds AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM pts GROUP BY 1),
      |spine AS (
      |  SELECT b.event_type,
      |         unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hr
      |  FROM bounds b),
      |j AS (
      |  SELECT s.event_type, s.hr, p.v
      |  FROM spine s LEFT JOIN pts p
      |    ON p.event_type = s.event_type AND p.hr = s.hr),
      |f AS (
      |  SELECT event_type, hr, v,
      |    last_value(v IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY hr
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
      |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY hr
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h0,
      |    first_value(v IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY hr
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
      |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY hr
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS h1
      |  FROM j)
      |SELECT event_type, hr,
      |  round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
      |    ELSE CAST(v0 AS DOUBLE)
      |      + (CAST(v1 AS DOUBLE) - CAST(v0 AS DOUBLE))
      |        * (CAST(date_diff('hour', h0, hr) AS DOUBLE)
      |           / CAST(date_diff('hour', h0, h1) AS DOUBLE)) END, 6)
      |    AS value_filled,
      |  CAST(v IS NULL AS INT) AS interpolated
      |FROM f
      |ORDER BY event_type, hr""".stripMargin) { (s, d) =>
    val pts = Tables.events(s, d)
      .filter(col("event_id") % 29 === 0)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(col("value").cast("decimal(12,2)")).cast("decimal(14,2)").as("v"))
      .localCheckpoint() // 2 consumers (spine bounds + grid join): one
      // events scan, not two — the relation is (type, hour)-bounded
    val spine = pts.groupBy("event_type")
      .agg(min("hr").as("lo"), max("hr").as("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("hr"))
    val wPrev = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val known = when(col("v").isNotNull, col("hr"))
    spine.join(pts, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"), col("v"),
        last(col("v"), ignoreNulls = true).over(wPrev).as("v0"),
        last(known, ignoreNulls = true).over(wPrev).as("h0"),
        first(col("v"), ignoreNulls = true).over(wNext).as("v1"),
        first(known, ignoreNulls = true).over(wNext).as("h1"))
      .select(col("event_type"), col("hr"),
        round(when(col("v").isNotNull, col("v").cast("double"))
          .otherwise(col("v0").cast("double")
            + (col("v1").cast("double") - col("v0").cast("double"))
              * (expr("timestampdiff(HOUR, h0, hr)").cast("double")
                 / expr("timestampdiff(HOUR, h0, h1)").cast("double"))), 6)
          .as("value_filled"),
        col("v").isNull.cast("int").as("interpolated"))
      .orderBy("event_type", "hr")
  }

  val all: Seq[DeclaredQuery] = Seq(qMad, qIqrOutliers, qWelch, qInterpolate)
}
