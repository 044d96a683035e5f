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

  test("held-out ranking is stable across retrains (label-drift guard)") {
    // round-5 verdict stretch #8: hold out a deterministic doc slice,
    // train twice FRESH on the remainder (cache bypassed), and assert
    // the held-out docs rank identically — a silent change in the
    // weak-label pipeline (quantile drift, feature change, seed loss)
    // shows up here as a ranking diff before it can corrupt a corpus.
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val holdout = docs.filter(col("doc_id") % 10 === 0)
    val m1 = TextAnalysis.trainQualityModel(train).get
    val m2 = TextAnalysis.trainQualityModel(train).get
    // seeded LR over the same plan is deterministic end-to-end
    assert(m1.weights.toSeq == m2.weights.toSeq && m1.intercept == m2.intercept,
      "retrain must reproduce the same coefficients")
    def ranking(m: TextAnalysis.QualityModel): Seq[Long] =
      TextAnalysis.scoreQuality(holdout, m)
        .select("doc_id", "quality_prob").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, p) => (-p, id) }.map(_._1).toSeq
    val r1 = ranking(m1)
    assert(r1 == ranking(m2), "held-out ranking drifted across retrains")
    // generalization: the held-out slice's own weak extremes stay
    // separated by a model that never saw those docs
    val scored = TextAnalysis.scoreQuality(holdout, m1)
    val qs = TextAnalysis.qualityFeatures(holdout)
      .stat.approxQuantile("heuristic", Array(0.25, 0.75), 0.001)
    val Seq(loAvg, hiAvg) = Seq(
      scored.filter(col("heuristic") <= qs(0)),
      scored.filter(col("heuristic") >= qs(1)))
      .map(_.agg(avg("quality_prob")).collect()(0).getDouble(0))
    assert(hiAvg > loAvg + 0.2,
      s"held-out extremes must separate: hi=$hiAvg lo=$loAvg")
  }

  test("observedClean books the funnel during the write action - no second scan") {
    import graft.streaming.CorpusGate
    val (clean, obs) = CorpusGate.observedClean(docs, "gate_spec")
    val outDir = SparkEnv.scratchDir("observed-clean")
    graft.sources.ShardWriter.writeShards(clean, outDir, maxRecordsPerFile = 200)
    val m = obs.get
    // counters from the write's own scan equal the standalone funnel
    val want = CorpusGate.stageCounters(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("c0") == want("0_total") && m("c1") == want("1_lang") &&
      m("c2") == want("2_length") && m("c3") == want("3_repetition"),
      s"observed=$m funnel=$want")
    // and the written corpus is exactly the survivors
    val written = spark.read.parquet(outDir).count()
    assert(written == want("3_repetition"), s"wrote $written, kept ${want("3_repetition")}")
  }
}
