package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Round-15 (VERDICT r14 #4): the warm serving tier under CONCURRENT
  * load. tools/WarmServeProf measures a single sequential client; a
  * real serving tier answers N reports at once, where per-query
  * latency trades against aggregate throughput (queries share the
  * fixed executor pool). This drives N client threads — each a loop
  * over its round-robin shard of the batch query library — against
  * ONE warm session with the FAIR scheduler, each client in its own
  * on-demand scheduler pool (`spark.scheduler.pool` local property;
  * FAIR across pools means one client's multi-stage query cannot
  * convoy the others behind it, the head-of-line blocking FIFO mode
  * exhibits). Publishes the warm per-query latency distribution and
  * wall/throughput per concurrency level, after one cache-populating
  * warm-up pass.
  *
  * FAIR mode is a STATIC conf (context creation) — shipped here as
  * code, with the builder's other settings inherited from SparkEnv.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.WarmServeConcProf [levels]"
  *   (default levels: 1 4 16)
  */
object WarmServeConcProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = SparkEnv.builder()
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.warmCpu(spark)

    val served = SparkEntry.queries.toSeq
      .filterNot(_._1.startsWith("q_stream"))
      .sortBy(_._1)
    println(s"serving ${served.size} batch queries, concurrency levels ${levels.mkString("/")}")

    // warm-up pass: codegen classes, footers, memoized artifacts
    for ((name, fn) <- served)
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"WARMUP FAIL $name: $e") }

    for (n <- levels) {
      val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val wall0 = System.nanoTime()
      val threads = (0 until n).map { i =>
        new Thread(() => {
          // each client in its own FAIR pool, created on demand
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"client-$i")
          for (((_, fn), j) <- served.zipWithIndex if j % n == i) {
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).queryExecution.toRdd.count()
              lats.add((System.nanoTime() - t0) / 1e9)
            } catch { case _: Throwable => () }
          }
        }, s"serve-client-$i")
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - wall0) / 1e9
      import scala.jdk.CollectionConverters._
      val xs = lats.asScala.toSeq.sorted
      if (xs.isEmpty) {
        println(f"N=$n%-3d  ALL ${served.size} queries FAILED  wall=$wall%.1f s")
        // report the level as failed, keep the other levels' results
      } else {
      def pct(q: Double): Double = xs((q * (xs.size - 1)).round.toInt)
      println(f"N=$n%-3d  ${xs.size} queries  wall=$wall%.1f s  " +
        f"throughput=${xs.size / wall}%.1f q/s  " +
        f"p50=${pct(0.50)}%.3f  p90=${pct(0.90)}%.3f  p95=${pct(0.95)}%.3f  max=${xs.last}%.3f s")
      }
    }
    spark.stop()
  }
}
