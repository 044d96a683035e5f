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

  test("artifact collect is bounded: maxEntries prunes to the top-count entries") {
    val full = LanguageModel.trainLmArtifact(target)
    // the hard ceiling holds even at default training — the collect is
    // provably O(MaxModelEntries), never O(corpus vocab)
    assert(full.biGrams.length <= LanguageModel.MaxModelEntries)
    assert(full.uniToks.length <= LanguageModel.MaxModelEntries)
    // fixture model is far below the ceiling → default prune never binds
    assert(full.biGrams.length < LanguageModel.MaxModelEntries / 100)

    val pruned = LanguageModel.trainLmArtifact(target, maxEntries = 5)
    assert(pruned.biGrams.length == 5 && pruned.uniToks.length == 5)
    // floor is computed from UNPRUNED totals — identical to the full model
    assert(pruned.floorLp == full.floorLp)
    // kept entries are exactly the 5 highest-count ones (count desc,
    // gram asc total order), with their full-denominator log-probs
    val top5bi = LanguageModel.bigramModel(target)
      .orderBy(col("c_bw").desc, col("gram")).limit(5)
      .collect().map(r => r.getString(0) ->
        r.getDecimal(1).unscaledValue().longValueExact()).toMap
    assert(pruned.biGrams.map(_.toString).toSet == top5bi.keySet)
    pruned.biGrams.zip(pruned.biLps).foreach { case (g, lp) =>
      assert(top5bi(g.toString) == lp, s"pruned gram $g kept a different lp")
    }
    // a pruned model still scores every doc (misses fall to backoff/floor)
    assert(viaExpr(docs, pruned).count() > 0)
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
