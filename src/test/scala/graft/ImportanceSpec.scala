package graft

import graft.operators.Importance
import org.apache.spark.sql.functions._

/** DSIR importance weighting: direction (target-like docs score
  * higher), exact decimal determinism under repartitioning, and the
  * gram accounting the oracle replays.
  */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def weights(df: org.apache.spark.sql.DataFrame) =
    Importance.importanceWeights(df, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("target-distinctive grams pull weights apart in the right direction") {
    // 'en' docs speak alpha, others beta; an unseen doc of pure alpha
    // must outscore a pure-beta one (md5 buckets of the two words
    // differ — asserted, so no collision can mask the direction)
    val b = Seq("alpha", "beta").map(w =>
      w -> java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString)
    assert(b(0)._2 != b(1)._2, s"fixture words collide: $b")

    val docs = (
      (0L until 8L).map(i => (i, "alpha alpha alpha", "en")) ++
      (8L until 16L).map(i => (i, "beta beta beta", "de")) ++
      Seq((16L, "alpha alpha alpha alpha", "zh"),   // target-like content, raw slice
          (17L, "beta beta beta beta", "zh"))
    ).toDF("doc_id", "text", "lang")
    val w = weights(docs)
    assert(w(16L)._2 > w(17L)._2,
      s"alpha doc ${w(16L)} must outscore beta doc ${w(17L)}")
    // the target gram always carries a higher log-ratio than the
    // raw-only gram (signs depend on the fixed B=256 smoothing mass,
    // which dominates at toy counts — ordering is the invariant)
    assert(w(0L)._2 > w(8L)._2, s"${w(0L)} / ${w(8L)}")
    // gram accounting: n_grams is the instance count, not distinct
    assert(w(16L)._1 == 4L && w(0L)._1 == 3L)
  }

  test("weights are bit-identical under repartitioning (decimal sums)") {
    val docs = Tables.documents(spark, sf)
    val base = weights(docs)
    val shuffled = weights(docs.repartition(7, col("source")))
    assert(base == shuffled)
  }

  test("NULL and empty texts contribute no gram rows") {
    val docs = Seq(
      (1L, "alpha beta", "en"),
      (2L, null.asInstanceOf[String], "en"),
      (3L, "", "de"),
      (4L, "   ", "de")
    ).toDF("doc_id", "text", "lang")
    val w = weights(docs)
    // split("   ", "\\s+") yields one leading empty token, filtered out
    assert(w.keySet == Set(1L), w.toString)
    assert(w(1L)._1 == 2L)
  }

  test("stateless fused scoring equals the relational pipeline exactly") {
    // the score-many path (constant-map λ lookup + decimal aggregate
    // HOF, no explode/join/shuffle) must reproduce the relational
    // form bit-for-bit — both sum the same DECIMAL(18,9) λ values
    val docs = Tables.documents(spark, sf)
    val model = Importance.trainRatioModel(docs, col("lang") === "en")
    val (nGrams, weight) = Importance.scoreColumns(model)
    val fused = docs.select(col("doc_id"), nGrams.as("n"), weight.as("w"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val relational = weights(docs)
    assert(fused == relational,
      s"diff=${(fused.toSet diff relational.toSet).take(3)} / " +
        s"${(relational.toSet diff fused.toSet).take(3)}")
  }

  test("unseen buckets score through the smoothed default, not null") {
    import spark.implicits._
    val train = Seq((1L, "alpha alpha", "en"), (2L, "alpha beta", "de"))
      .toDF("doc_id", "text", "lang")
    val model = Importance.trainRatioModel(train, col("lang") === "en")
    val (nGrams, weight) = Importance.scoreColumns(model)
    val scored = Seq((9L, "gamma delta gamma"))   // nothing seen at train time
      .toDF("doc_id", "text")
      .select(col("doc_id"), nGrams.as("n"), weight.as("w")).collect().head
    assert(scored.getLong(1) == 3L)
    assert(!scored.isNullAt(2), "unseen grams must hit the default λ")
    val expected = model.default.doubleValue * 3
    assert(math.abs(scored.getDouble(2) - expected) < 1e-9,
      s"${scored.getDouble(2)} vs $expected")
  }

  test("cachedRatioModel trains once per key") {
    val docs = Tables.documents(spark, sf)
    val k = s"spec-cache-${System.nanoTime()}"
    val a = Importance.cachedRatioModel(docs, col("lang") === "en", k)
    val b = Importance.cachedRatioModel(docs.limit(1), col("lang") === "zh", k)
    assert(a eq b, "second call with the same key must not retrain")
    assert(a.lambda.nonEmpty)
  }

  test("dsir select keeps exactly ceil(20%) of every language slice, ranked") {
    val sel = SparkEntry.queries("q_dsir_select")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // the weight relation only contains docs with >= 1 token (NULL or
    // whitespace-only texts produce no gram rows), so size the slices
    // against that same population
    val perLang = Tables.documents(spark, sf)
      .filter(col("text").isNotNull &&
        length(regexp_replace(col("text"), "\\s", "")) > 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sel.groupBy(_._1).view.mapValues(_.length).toMap
    for ((lang, n) <- perLang)
      assert(kept.getOrElse(lang, 0) == math.ceil(0.2 * n).toInt,
        s"$lang: kept ${kept.get(lang)} of $n")
    // within a slice, ranks are 1..k and weights non-increasing
    for ((lang, rows) <- sel.groupBy(_._1)) {
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq, lang)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3; case _ => true }, lang)
    }
  }

  test("dsir shard drop: shard membership == select membership, deterministic, pruned layout") {
    val docs = Tables.documents(spark, sf)
    val dir = SparkEnv.scratchDir("dsir-shard-drop")
    Importance.dsirShardDrop(docs, dir, col("lang") === "en")
    val back = spark.read.parquet(dir)
    // membership: exactly the q_dsir_select docs, with their langs
    val want = Importance.selectTopFraction(docs, col("lang") === "en")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val got = back.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    // weight/rk ride along as data columns; split is the content hash
    assert(back.columns.toSet.intersect(Set("weight", "rk", "split")) ==
      Set("weight", "rk", "split"))
    // determinism: a repartitioned re-drop lays out identical membership
    val dir2 = SparkEnv.scratchDir("dsir-shard-drop-b")
    Importance.dsirShardDrop(docs.repartition(7, col("source")), dir2,
      col("lang") === "en")
    def layout(d: String) = spark.read.parquet(d)
      .select("doc_id", "split", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(layout(dir) == layout(dir2))
    // the dataloader read path prunes to one (split, lang) directory
    val pruned = spark.read.parquet(dir)
      .filter(col("split") === "train" && col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("split"), plan)
  }

  test("declared top-50 ranking is total: weight desc then doc_id") {
    val rows = SparkEntry.queries("q_dsir_weights")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length == 50)
    val resorted = rows.sortBy { case (id, w) => (-w, id) }
    assert(rows.toSeq == resorted.toSeq, "output must arrive in gate order")
  }
}
