package graft.tools

import graft.{SparkEntry, SparkEnv}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-only suite-wide fixed-overhead census (round-15 optimization):
  * for every batch query, one warm timed run recording wall seconds,
  * job count, stage count, task count, and Σ per-stage wall — the
  * floor share is then wall − Σstage. Ranks queries by job count so
  * the ones paying outsized scheduler/AQE-barrier machinery relative
  * to their data work stand out (guide §1/§2.4: each Exchange under
  * AQE is a materialized stage job; each job costs ~40 ms on this
  * host — tools/FloorProf round 13).
  *
  *   sbt "runMain graft.tools.StageCensus [q_a q_b ...]"
  */
object StageCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    val names = (if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted)
      .filterNot(_.startsWith("q_stream_")) // streams: see StreamFloorProf
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var stageMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += sc.stageInfo.numTasks
        stageMs += (for (s <- sc.stageInfo.submissionTime;
          c <- sc.stageInfo.completionTime) yield c - s).getOrElse(0L)
      }
    }
    val rows = names.flatMap { name =>
      try {
        val fn = SparkEntry.queries(name)
        spark.catalog.clearCache()
        fn(spark, sfDir).queryExecution.toRdd.count() // warm pass
        spark.catalog.clearCache()
        spark.sparkContext.addSparkListener(listener)
        // drain the async bus before resetting: a still-dispatching
        // warm-pass event must not land in the timed window (advisor
        // r15 #3 — the previous fixed 150 ms sleep guaranteed neither
        // direction)
        org.apache.spark.GraftScratchBridge.waitListenerBusEmpty(spark.sparkContext)
        jobs = 0; stages = 0; tasks = 0; stageMs = 0L
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftScratchBridge.waitListenerBusEmpty(spark.sparkContext)
        spark.sparkContext.removeSparkListener(listener)
        Some((name, wall, jobs, stages, tasks, stageMs / 1e3))
      } catch { case e: Throwable =>
        println(s"FAIL $name: $e"); None }
    }
    println(f"${"query"}%-34s ${"wall"}%7s ${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s ${"stgSec"}%7s ${"floor"}%7s")
    rows.sortBy(-_._3).foreach { case (n, w, j, s, t, sm) =>
      println(f"$n%-34s $w%7.3f $j%5d $s%4d $t%6d $sm%7.3f ${w - sm}%7.3f")
    }
    val (tw, tj, ts) = (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._6).sum)
    println(f"TOTAL wall=$tw%.1f s jobs=$tj stageSec=$ts%.1f")
    spark.stop()
  }
}
