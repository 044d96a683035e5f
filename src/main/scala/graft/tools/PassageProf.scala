package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q_passage_overlap (round-6 verdict #5:
  * single-eval landed but wall-clock stayed ~1.6 s — find the dominant
  * stage before optimizing further). Times each pipeline prefix at the
  * given sf dir, min of `passes` runs, cache cleared between runs.
  */
object PassageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = graft.SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)

    val docs = Tables.documents(spark, sfDir)
    val (n, w, minShared, maxDf) = (3, 4, 2, 64)

    def fused = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), expr(s"winnow_fps(text, $n, $w)").as("fps"))
    def exploded = fused
      .select(col("doc_id"), size(col("fps")).as("nf"), explode(col("fps")).as("fp"))
    def buckets = exploded.groupBy("fp")
      .agg(collect_list(struct(col("doc_id"), col("nf"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxDf)
    def pairs = buckets.select(expr("ordered_pairs(ids)"))
    def full = graft.operators.Dedup.passageOverlapPairs(docs, n, w, minShared, maxDf)
    // pre-round-7 combinator form, kept for A/B timing
    def fullOld = exploded.groupBy("fp")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("nf")))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxDf)
      .select(explode(expr(
        "flatten(transform(sequence(0, size(ids) - 2), " +
          "i -> transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "b -> struct(ids[i].doc_id AS id_a, ids[i].nf AS n_a, " +
          "b.doc_id AS id_b, b.nf AS n_b))))")).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
      .select(col("id_a"), col("id_b"), col("n_shared_fps"),
        round(col("n_shared_fps").cast("double") /
          least(col("n_a"), col("n_b")), 6).as("overlap"))

    val stages: Seq[(String, () => Long)] = Seq(
      "scan only (docs.count)" -> (() => docs.count()),
      "winnow_fps (fused.toRdd)" -> (() => fused.queryExecution.toRdd.count()),
      "+ explode (rows)" -> (() => exploded.queryExecution.toRdd.count()),
      "+ groupBy fp buckets" -> (() => buckets.queryExecution.toRdd.count()),
      "+ pair expansion" -> (() => pairs.queryExecution.toRdd.count()),
      "full query (ordered_pairs)" -> (() => full.queryExecution.toRdd.count()),
      "full query (old combinator)" -> (() => fullOld.queryExecution.toRdd.count()))

    // PASS-MAJOR interleave (same rationale as Bench): a load spike
    // poisons at most one sample of each stage, never all of them
    val best = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    val rowsOf = scala.collection.mutable.Map[String, Long]()
    for (_ <- 1 to passes; (label, f) <- stages) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      rowsOf(label) = f()
      best(label) = math.min(best(label), (System.nanoTime() - t0) / 1e9)
    }
    for ((label, _) <- stages)
      println(f"[pprof] $label%-28s ${best(label)}%8.3f s  (${rowsOf(label)} rows)")
    spark.stop()
  }
}
