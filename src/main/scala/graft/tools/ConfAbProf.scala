package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Dev-only SAME-JVM interleaved A/B for runtime-togglable I/O knobs —
  * this host's load drift swamps cross-JVM comparisons (whole
  * streaming class swings ±0.2–2 s between JVMs with zero code
  * change; see SCALING.md round-14 adjudication), so any honest knob
  * measurement must alternate variants inside one session.
  *
  * Variant B toggles, per timed run, via mutable per-JVM state:
  *   - `mapreduce.fileoutputcommitter.algorithm.version=2` on the
  *     SparkContext hadoopConfiguration (job-time merged into every
  *     write's committer conf)
  *   - `FileSystem.setWriteChecksum(false)` on the cached `file://`
  *     LocalFileSystem instance (skips the .crc shadow file every
  *     Hadoop-FS write otherwise creates; instance-level, shared by
  *     driver and local-mode executors)
  * Variant A restores v1 + checksums. Usage:
  *
  *   SPARK_GRAFT_PASSES=3 sbt "runMain graft.tools.ConfAbProf q_a q_b"
  */
object ConfAbProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }
    val hc = spark.sparkContext.hadoopConfiguration
    val localFs = org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI("file:///"), hc)
    def setVariant(b: Boolean): Unit = {
      hc.set("mapreduce.fileoutputcommitter.algorithm.version",
        if (b) "2" else "1")
      localFs.setWriteChecksum(!b)
    }
    val acc = scala.collection.mutable.Map[(String, Boolean), Double]()
      .withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; b <- Seq(false, true); name <- names) {
      setVariant(b)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok = try {
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true
      } catch { case e: Throwable => println(s"FAIL $name ($b): $e"); false }
      val t = (System.nanoTime() - t0) / 1e9
      if (ok) acc((name, b)) = math.min(acc((name, b)), t)
      println(f"pass $p ${if (b) "B" else "A"} $name%-28s $t%8.3f s")
    }
    setVariant(b = false)
    println("--- per-query min: A(v1+crc) vs B(v2+nocrc) ---")
    names.foreach { n =>
      val (a, b) = (acc((n, false)), acc((n, true)))
      println(f"$n%-34s A=$a%7.3f B=$b%7.3f d=${b - a}%+7.3f")
    }
    spark.stop()
  }
}
