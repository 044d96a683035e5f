package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The learned quality gate: weak-supervision training must separate
  * its own extremes, scoring must stay udf-free (codegen'd Column
  * arithmetic), and the per-dir model cache must be train-once.
  */
class TextAnalysisSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("quality classifier separates its weak-label extremes") {
    val model = TextAnalysis.trainQualityModel(docs).get
    val scored = TextAnalysis.scoreQuality(docs, model)
    val Array(q25, q75) = TextAnalysis.qualityFeatures(docs)
      .stat.approxQuantile("heuristic", Array(0.25, 0.75), 0.001)
    val Seq(loAvg, hiAvg) = Seq(
      scored.filter(col("heuristic") <= q25),
      scored.filter(col("heuristic") >= q75))
      .map(_.agg(avg("quality_prob")).collect()(0).getDouble(0))
    assert(hiAvg > loAvg + 0.2,
      s"model must separate weak extremes: hi=$hiAvg lo=$loAvg")
    // probabilities are probabilities
    val bad = scored.filter(col("quality_prob") < 0 || col("quality_prob") > 1).count()
    assert(bad == 0L)
  }

  test("quality scoring is a codegen'd scan - no UDF, no MLlib transform") {
    val model = TextAnalysis.trainQualityModel(docs).get
    val plan = TextAnalysis.scoreQuality(docs, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"),
      s"score-many path must not carry a udf:\n$plan")
  }

  test("quality model trains once per corpus dir and caches") {
    val m1 = TextAnalysis.cachedQualityModel(docs, sf).get
    val m2 = TextAnalysis.cachedQualityModel(docs, sf).get
    assert(m1 eq m2, "second lookup must hit the cache")
    assert(m1.weights.length == 5)
  }

  test("empty corpus trains no quality model") {
    assert(TextAnalysis.trainQualityModel(docs.filter(col("doc_id") < -1)).isEmpty)
  }
}
