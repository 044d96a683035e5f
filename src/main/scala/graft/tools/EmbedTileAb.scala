package graft.tools

import graft.{SparkEnv, Tables}

/** Dev-only same-JVM interleaved A/B for the round-16 tile-join
  * parallelism fix (guide §1 discipline — cross-JVM deltas are
  * noise-bound on this host): q_embed_near_dup's blocked all-pairs
  * join with and without the explicit tile-key repartition of the
  * probe side. Asserts row-identical results every pass, prints
  * per-variant mins and the per-variant task counts (the mechanistic
  * evidence: the unpartitioned shape runs the whole n² evaluation as
  * ONE task behind the broadcast join).
  *
  *   sbt "runMain graft.tools.EmbedTileAb"
  */
object EmbedTileAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    val blocks = sys.env.get("SPARK_GRAFT_AB_BLOCKS").map(_.toInt)
      .getOrElse(graft.queries.LlmOps.nearDupBlocks(spark))
    val parts = SparkEnv.shuffleParts(spark)
    def mk(split: Boolean) = graft.queries.LlmOps.embedNearDupBlocked(
        Tables.embeddings(spark, sfDir), blocks = blocks,
        parts = if (split) Some(parts) else None)
      .orderBy("id_a", "id_b")
    // result parity first (the oracle re-checks at both sfs; this is
    // the fast in-harness guard)
    val a = mk(split = true).collect().map(_.toString).toSeq
    val b = mk(split = false).collect().map(_.toString).toSeq
    require(a == b, s"REPARTITION CHANGED THE RESULT: ${a.size} vs ${b.size} rows" +
      s"\nonlySplit=${(a.toSet -- b.toSet).take(5)}\nonlyBase=${(b.toSet -- a.toSet).take(5)}")
    println(s"results identical (${a.size} rows); blocks=$blocks parts=$parts")
    // task-count probe: how many tasks does each variant's full run use?
    val taskCount = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskCount.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    for (split <- Seq(false, true)) {
      org.apache.spark.GraftScratchBridge.waitListenerBusEmpty(spark.sparkContext)
      taskCount.set(0)
      mk(split).queryExecution.toRdd.count()
      org.apache.spark.GraftScratchBridge.waitListenerBusEmpty(spark.sparkContext)
      println(s"split=$split tasks=${taskCount.get()}")
    }
    // variants: (blocks, split) — the B sweep decides nearDupBlocks'
    // tile factor alongside the split decision, same JVM
    def mkv(bl: Int, split: Boolean) = graft.queries.LlmOps.embedNearDupBlocked(
        Tables.embeddings(spark, sfDir), blocks = bl,
        parts = if (split) Some(parts) else None)
      .orderBy("id_a", "id_b")
    val variants = Seq((blocks, false), (blocks, true), (blocks * 2, true),
      (blocks * 4, true))
    val best = scala.collection.mutable.Map[(Int, Boolean), Double]()
      .withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; v <- variants) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mkv(v._1, v._2).queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      best(v) = math.min(best(v), t)
      println(f"pass $p blocks=${v._1}%-3d split=${v._2}%-5s $t%7.3f s")
    }
    variants.foreach(v => println(f"min blocks=${v._1}%-3d split=${v._2}%-5s ${best(v)}%.3f s"))
    // optional plan evidence: SPARK_GRAFT_AB_PLANS=<dir> writes the
    // explain("formatted") of both shapes (the plans/r16 artifacts)
    sys.env.get("SPARK_GRAFT_AB_PLANS").foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      Seq(("before", false), ("after", true)).foreach { case (tag, split) =>
        val plan = mk(split).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"q_embed_near_dup_$tag.txt"),
          (s"# q_embed_near_dup ($tag: split=$split blocks=$blocks parts=$parts) over $sfDir\n\n"
            + plan).getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
