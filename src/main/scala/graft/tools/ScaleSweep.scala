package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Dev tool: empirical scaling curves for the scale-critical declared
  * queries — run each at sf0.001 / sf0.01 / sf0.1 (10× data per step
  * on events/lineitem; documents step 1× then 10×) and report the
  * wall-time growth ratio per decade. A linear operator shows ratio ≲
  * 10 on its scaling decade (usually much less, because the ~0.15 s
  * per-action floor and one-task scan segments don't scale with
  * rows); a super-linear pair expansion or accidental cross join
  * shows ratio ≫ 10 and fails the sweep's printed verdict. Output is
  * pasted into SCALING.md as measured evidence beside the per-operator
  * arguments.
  *
  *   sbt "runMain graft.tools.ScaleSweep [query ...]"
  */
object ScaleSweep {
  private val defaults = Seq(
    // TPC-H-shaped (lineitem/orders scale 10× per decade)
    "q_pricing_summary", "q_window_rank", "q_topk_customers",
    "q_order_lineitem", "q_asof_join",
    // events-shaped (10× per decade)
    "q_events_hourly", "q_events_distinct_users_daily", "q_sliding_windows",
    "q_session_windows", "q_cohort_retention", "q_user_rfm",
    // documents-shaped (1× then 10×)
    "q_exact_dedup", "q_minhash_near_dups", "q_simhash_near_dups",
    "q_winnow_fingerprints", "q_passage_overlap", "q_containment_pairs",
    "q_substring_spans", "q_token_df", "q_dsir_weights",
    "q_lsh_semantic_dedup", "q_dedup_clusters", "q_chunk_documents",
    "q_domain_rank",
    // embeddings-shaped
    "q_cosine_topk", "q_embed_near_dup")

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else defaults
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }
    val passes = 2
    println(f"| query | sf0.001 | sf0.01 | sf0.1 | ratio 0.01→0.1 |")
    println("|---|---|---|---|---|")
    var worst = ("", 0.0)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val t = sfs.map { sf =>
        (1 to passes).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, sf).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val ratio = t(2) / t(1)
      if (ratio > worst._2) worst = (name, ratio)
      println(f"| $name | ${t(0)}%.3f | ${t(1)}%.3f | ${t(2)}%.3f | ${ratio}%.2f× |")
    }
    println(f"\nworst decade ratio: ${worst._1} at ${worst._2}%.2f× " +
      "(10× data; > 10× would flag a super-linear operator)")
    spark.stop()
  }
}
