package graft

import org.apache.spark.sql.functions._

/** Gates for the round-9 closed-form OLS and deterministic weighted
  * sampling operators.
  */
class RegressionSamplingSpec extends SparkSpec {

  test("q_regression_by_brand agrees with Spark's regr_* built-ins to 1e-6 " +
      "(the declared outputs are round(·,6))") {
    val builtin = Tables.part(spark, sf)
      .groupBy("p_brand")
      .agg(
        expr("regr_slope(p_retailprice, p_size)").as("b_slope"),
        expr("regr_intercept(p_retailprice, p_size)").as("b_intercept"),
        expr("regr_r2(p_retailprice, p_size)").as("b_r2"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val declared = SparkEntry.queries("q_regression_by_brand")(spark, sf)
      .collect()
    assert(declared.length === builtin.size)
    declared.foreach { r =>
      val (bs, bi, br) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(2) - bs) < 1e-6, s"slope ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - bi) < 1e-6, s"intercept ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - br) < 1e-6, s"r2 ${r.getString(0)}")
    }
  }

  test("q_weighted_sample equals a plain-Scala Efraimidis–Spirakis draw") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp52(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val keyed = docs.map { case (id, nc) =>
      val u = (fp52(s"$id:ws") + 0.5) / 4503599627370496.0
      (id, nc, q9(-math.log(u) / nc))
    }
    val expected = keyed.sortBy { case (id, _, k) => (k, id) }.take(50)
      .zipWithIndex.map { case ((id, nc, _), i) => (id, nc, (i + 1).toLong) }
    val declared = SparkEntry.queries("q_weighted_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue))
    assert(declared.toSeq === expected.toSeq)
  }

  test("weighted sample over-represents heavy documents (weight = n_chars)") {
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg("n_chars")).collect()(0).getDouble(0)
    val sampleMean = SparkEntry.queries("q_weighted_sample")(spark, sf)
      .agg(avg("n_chars")).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }
}
