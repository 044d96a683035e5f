package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The round-12 deterministic fixed-round quality classifier (the
  * value gate behind q_quality_classifier): training must be exactly
  * reproducible and partitioning-invariant (integer micro-unit sums
  * are order-free — that is the whole point of the quantized-GD
  * design), must actually learn (non-trivial weights that separate
  * the weak-label extremes), and the cached model must equal a fresh
  * train. The cross-engine half of the gate is the DuckDB chained-CTE
  * replay the driver runs (qcOracle).
  */
class QcDeterministicSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("quantized-GD training is deterministic and partitioning-invariant") {
    val m1 = TextAnalysis.trainQcModel(docs)
    val m2 = TextAnalysis.trainQcModel(docs.repartition(7))
    assert(m1.weights.sameElements(m2.weights),
      s"weights must be partition-invariant: ${m1.weights.toSeq} vs ${m2.weights.toSeq}")
    assert(m1.mins.sameElements(m2.mins) && m1.maxs.sameElements(m2.maxs))
  }

  test("quantized-GD model is non-trivial and separates weak extremes") {
    val m = TextAnalysis.trainQcModel(docs)
    assert(m.weights.exists(_ != 0L), "training must move the weights")
    // scores must order with the weak-label signal: docs in the
    // heuristic's top quartile must outscore the bottom quartile on
    // average (same criterion the MLlib spec applies, on z instead of
    // a probability)
    val q = TextAnalysis.qcQuantDocs(docs)
    val n = q.count()
    val qs = q.select(col("qh")).orderBy("qh").collect().map(_.getLong(0))
    val (lo, hi) = (qs((n / 4).toInt - 1), qs(n.toInt - (n / 4).toInt))
    val scored = TextAnalysis.qcScorePerDoc(docs, m)
    val Seq(loAvg, hiAvg) = Seq(
      scored.filter(col("qh") <= lo), scored.filter(col("qh") >= hi))
      .map(_.agg(avg(col("z").cast("double"))).collect()(0).getDouble(0))
    assert(hiAvg > loAvg + 2.0e9, // ≥ 0.2 separation in real units
      s"model must separate weak extremes: hi=$hiAvg lo=$loAvg")
  }

  test("quantized-GD cached model equals fresh train") {
    val c1 = TextAnalysis.cachedQcModel(spark, docs, sf)
    val c2 = TextAnalysis.cachedQcModel(spark, docs, sf)
    val fresh = TextAnalysis.trainQcModel(docs)
    assert(c1 eq c2, "second lookup must hit the cache")
    assert(c1.weights.sameElements(fresh.weights))
  }

  test("quantized-GD scoring is one codegen'd scan - no UDF, no join") {
    val m = TextAnalysis.trainQcModel(docs)
    val plan = TextAnalysis.qcScore(docs, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"))
    assert(!plan.contains("Join"),
      s"literal-weight scoring must not join:\n$plan")
  }
}
