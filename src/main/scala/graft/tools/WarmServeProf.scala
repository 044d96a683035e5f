package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Round-14 (VERDICT r13 #8): the warm-serving-tier follow-through of
  * the round-13 codegen-cache finding. A long-lived driver serving a
  * fixed query library pays whole-stage recompilation only while the
  * codegen class cache is below its working set; once warm, per-query
  * latency is the data cost plus the ~40 ms/job scheduler floor. This
  * tool SERVES the full batch library repeatedly from one warm
  * session and publishes (a) the warm per-query latency distribution
  * (p50/p90/p95/max over queries, per-query min over serve passes —
  * the serving-tier SLO numbers) and (b) the HEAP actually held by
  * the compiled-class cache, measured (not guessed) as the used-heap
  * delta across a reflective invalidateAll() of
  * CodeGenerator.cache with forced GC on both sides.
  *
  * Streaming twins are excluded: a serving tier answers point/report
  * QUERIES; the streaming pipelines are continuous jobs with their
  * own amortization story (SCALING.md round-10).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.WarmServeProf [passes]"
  */
object WarmServeProf {
  private def usedHeapAfterGc(): Long = {
    (1 to 3).foreach { _ => System.gc(); Thread.sleep(200) }
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  /** Spark's whole-stage-codegen class cache, reached reflectively:
    * `CodeGenerator.cache` is a `NonFateSharingLoadingCache` wrapper
    * (Spark 4) around the shaded Guava cache — unwrap until an object
    * exposes the size()/invalidateAll() API, loud if the structure
    * changes.
    */
  private def codegenCache(): AnyRef = {
    val clazz = Class.forName(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
    val module = clazz.getField("MODULE$").get(null)
    val f = clazz.getDeclaredField("cache")
    f.setAccessible(true)
    var c: AnyRef = f.get(module)
    def hasApi(o: AnyRef): Boolean =
      try { o.getClass.getMethod("size"); o.getClass.getMethod("invalidateAll"); true }
      catch { case _: NoSuchMethodException => false }
    var depth = 0
    while (!hasApi(c)) {
      depth += 1
      require(depth <= 3, s"cannot unwrap codegen cache: ${c.getClass}")
      val inner = c.getClass.getDeclaredFields
        .find(_.getType.getName.toLowerCase.contains("cache"))
        .getOrElse(sys.error(s"no inner cache field on ${c.getClass}: " +
          c.getClass.getDeclaredFields.map(fl => fl.getName + ":" + fl.getType.getName).mkString(", ")))
      inner.setAccessible(true)
      c = inner.get(c)
    }
    c
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }

    val served = SparkEntry.queries.toSeq
      .filterNot(_._1.startsWith("q_stream"))
      .sortBy(_._1)
    println(s"serving ${served.size} batch queries x $passes warm passes (after 1 warm-up pass)")

    // pass 0: populate caches (codegen classes, parquet footers,
    // memoized artifacts) — the warm-up a serving tier pays at deploy
    for ((name, fn) <- served) {
      spark.catalog.clearCache()
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"WARMUP FAIL $name: $e") }
    }

    val lat = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    val passTotals = scala.collection.mutable.ArrayBuffer[Double]()
    for (p <- 1 to passes) {
      var total = 0.0
      for ((name, fn) <- served) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        if (ok) { lat(name) = math.min(lat(name), t); total += t }
      }
      passTotals += total
      println(f"pass $p total ${total}%.1f s")
    }

    val xs = served.map(_._1).map(lat).filter(_ < Double.MaxValue).sorted
    def pct(q: Double): Double = xs((q * (xs.size - 1)).round.toInt)
    println(f"warm per-query latency over ${xs.size} queries (min of $passes serve passes):")
    println(f"  p50=${pct(0.50)}%.3f s  p90=${pct(0.90)}%.3f s  p95=${pct(0.95)}%.3f s  max=${xs.last}%.3f s  suite=${xs.sum}%.1f s")
    println("slowest 5: " + served.map(_._1).sortBy(-lat(_)).take(5)
      .map(n => f"$n=${lat(n)}%.2f").mkString(", "))

    // compiled-class cache heap: measured across a reflective flush
    val cache = codegenCache()
    val sizeM = cache.getClass.getMethod("size")
    val entries = sizeM.invoke(cache).asInstanceOf[java.lang.Long]
    val before = usedHeapAfterGc()
    cache.getClass.getMethod("invalidateAll").invoke(cache)
    val after = usedHeapAfterGc()
    val heldMb = (before - after) / 1e6
    println(f"codegen cache: $entries entries, measured heap held = $heldMb%.1f MB " +
      f"(${(before - after) / math.max(1L, entries)} B/entry; used ${before / 1e6}%.0f -> ${after / 1e6}%.0f MB)")
    spark.stop()
  }
}
