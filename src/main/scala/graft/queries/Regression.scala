package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.functions._

/** Closed-form least-squares regression (round 9): per-brand OLS of
  * retail price on size — slope, intercept, and R² from the five
  * sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²). This is how
  * regression runs at 100 TB: ONE map-side-combinable aggregate per
  * group produces the sufficient statistics; the model solve is O(1)
  * arithmetic on the aggregated row. (Spark's built-in `regr_slope`
  * et al. compute the same moments but accumulate in floating point,
  * whose partition-order nondeterminism can't be hash-gated;
  * RegressionSamplingSpec pins agreement with the built-ins to 1e-6,
  * the declared round(·,6) quantum.)
  *
  * Exactness discipline: y = p_retailprice is 2-decimal data →
  * DECIMAL(12,2) exact; all five sums are exact decimal/long
  * aggregates (order-independent), then explicitly cast to TIGHT
  * precisions before combining so every decimal product stays within
  * 38 digits — Spark silently ROUNDS decimal products that would
  * exceed precision 38 (allowPrecisionLoss default), so e.g. a
  * decimal(33,2) Σxy must be cut to decimal(16,2) (its true value
  * range) before n·Σxy. The only floats are the three final
  * divisions of exact numerators/denominators, each rounded to 6.
  */
object Regression {

  val qRegressionByBrand = DeclaredQuery(
    "q_regression_by_brand",
    """WITH s AS (
      |  SELECT p_brand,
      |         count(*) AS n,
      |         sum(p_size) AS sx,
      |         CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS sy,
      |         CAST(sum(p_size * CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(16,2)) AS sxy,
      |         sum(p_size * p_size) AS sxx,
      |         CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))
      |                  * CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS syy
      |  FROM part GROUP BY 1)
      |SELECT p_brand, CAST(n AS BIGINT) AS n,
      |  CASE WHEN n * sxx - sx * sx <> 0 THEN
      |    round(CAST(n * sxy - sx * sy AS DOUBLE)
      |          / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
      |  CASE WHEN n * sxx - sx * sx <> 0 THEN
      |    round(CAST(sy * sxx - sx * sxy AS DOUBLE)
      |          / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS intercept,
      |  CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
      |    round((CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
      |          / (CAST(n * sxx - sx * sx AS DOUBLE)
      |             * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS r2
      |FROM s ORDER BY p_brand""".stripMargin) { (s, d) =>
    val yDec = col("p_retailprice").cast("decimal(12,2)")
    val stats = Tables.part(s, d).groupBy("p_brand").agg(
      count(lit(1)).as("n"),
      sum(col("p_size")).as("sx"),
      sum(yDec).cast("decimal(14,2)").as("sy"),
      sum(col("p_size") * yDec).cast("decimal(16,2)").as("sxy"),
      sum(col("p_size") * col("p_size")).as("sxx"),
      sum(yDec * yDec).cast("decimal(18,4)").as("syy"))
    // n enters decimal products as DECIMAL(10,0), not LongType —
    // Spark widens Long to decimal(20,0) and decimal(20,0)×syy(18,4)
    // is precision 39 > 38, which triggers silent precision-loss
    // rounding; the tight cast keeps every product exact
    val nD = col("n").cast("decimal(10,0)")
    val num = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
    // degenerate-group guards (round-14 review, the statsFuncs
    // discipline): a brand whose parts share ONE p_size makes the
    // variance denominator exactly 0 — Spark's ANSI double divide
    // THROWS (measured: DIVIDE_BY_ZERO) while DuckDB yields NULL; the
    // CASE pins both engines to NULL, tested on the exact integer/
    // decimal values before any double cast
    val denExact = col("n") * col("sxx") - col("sx") * col("sx")
    val dyyExact = nD * col("syy") - col("sy") * col("sy")
    val den = denExact.cast("double")
    val dyy = dyyExact.cast("double")
    stats.select(
      col("p_brand"), col("n"),
      when(denExact =!= 0, round(num / den, 6)).as("slope"),
      when(denExact =!= 0,
        round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") / den, 6))
        .as("intercept"),
      when(denExact =!= 0 && dyyExact =!= 0,
        round((num * num) / (den * dyy), 6)).as("r2"))
      .orderBy("p_brand")
  }

  val all: Seq[DeclaredQuery] = Seq(qRegressionByBrand)
}
