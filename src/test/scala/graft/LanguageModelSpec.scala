package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.toColumn

/** Stupid-backoff LM quality scoring: the one-pass [[LmDocScore]]
  * scorer vs the relational join pipeline (bit-equality), model edge
  * cases, order-independence, and single-eval plan shape.
  */
class LanguageModelSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val target = docs.filter(col("lang") === "en")

  private def viaExpr(input: org.apache.spark.sql.DataFrame,
      model: graft.functions.LmArtifact) = {
    val (n, a) = LanguageModel.scoreColumns(model)
    input.select(col("doc_id"), n.as("n_trans"), a.as("avg_logprob"))
      .filter(col("n_trans") > 0)
  }

  test("expression scorer equals the relational pipeline bit-for-bit") {
    val rel = LanguageModel.docScores(docs, target)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val model = LanguageModel.trainLmArtifact(target)
    val ex = viaExpr(docs, model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rel.keySet == ex.keySet)
    rel.foreach { case (id, (n, a)) =>
      assert(ex(id)._1 == n, s"doc $id n_trans differs")
      // bit-equality, not tolerance: both paths sum the same quantized
      // decimals and divide once
      assert(java.lang.Double.doubleToLongBits(ex(id)._2) ==
        java.lang.Double.doubleToLongBits(a), s"doc $id avg_logprob differs")
    }
  }

  test("edge docs: null, empty, one token, OOV-only, multi-space") {
    import spark.implicits._
    val edge = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "solo"),
      (4L, "zzq qqz zzq"), // fully OOV → unigram misses → floor only
      (5L, "a  b")         // empty middle token is a real token
    ).toDF("doc_id", "text")
    val model = LanguageModel.trainLmArtifact(target)
    val got = viaExpr(edge, model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null/empty/one-token docs have no transitions and are filtered
    assert(got.keySet == Set(4L, 5L))
    assert(got(4L) == 2L)
    assert(got(5L) == 2L) // tokens "a", "", "b" → 2 transitions
    // OOV doc sums exactly 2× the floor
    val floorAvg = viaExpr(edge.filter($"doc_id" === 4L), model)
      .select(col("avg_logprob")).head().getDouble(0)
    val expected = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(2L * model.floorLp), 9).doubleValue / 2L
    assert(java.lang.Double.doubleToLongBits(floorAvg) ==
      java.lang.Double.doubleToLongBits(expected))
  }

  test("relational scores are invariant under repartitioning") {
    val base = LanguageModel.docScores(docs, target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val shuffled = LanguageModel.docScores(docs.repartition(7), target.repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base == shuffled)
  }

  test("scorer evaluates once per row despite filter + two field reads") {
    val model = LanguageModel.trainLmArtifact(target)
    val (n, a) = LanguageModel.scoreColumns(model)
    val plan = docs.select(col("doc_id"), n.as("n_trans"), a.as("avg_logprob"))
      .filter(col("n_trans") > 0)
      .queryExecution.optimizedPlan
    var evals = 0
    plan.foreach(_.expressions.foreach(_.foreach {
      case _: graft.functions.LmDocScore => evals += 1
      case _ => ()
    }))
    // one hoisted projection eval; field reads + filter reference it
    assert(evals == 1, s"expected exactly 1 LmDocScore eval in plan, got $evals")
  }

  test("bigram log-probs normalize: per-context probabilities sum to 1") {
    val rows = LanguageModel.bigramModel(target).collect()
    val byCtx = rows.groupBy(r => r.getString(0).split(" ", 2)(0))
    byCtx.foreach { case (ctx, grams) =>
      val total = grams.map(r => math.exp(r.getDecimal(1).doubleValue)).sum
      assert(math.abs(total - 1.0) < 1e-6, s"context '$ctx' sums to $total")
    }
  }
}
