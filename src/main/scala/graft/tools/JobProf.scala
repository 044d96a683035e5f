package graft.tools

import graft.{SparkEntry, SparkEnv}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only per-stage profiler for one declared query: runs the query
  * warm (2nd run timed), records every completed stage's wall time,
  * task count, and shuffle bytes via a listener, and prints the
  * formatted plan on request. Pinpoints WHICH shuffle/stage dominates
  * a slow query rather than guessing from the plan.
  *
  *   sbt "runMain graft.tools.JobProf q_tpch_q18 [plan]"
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val showPlan = args.contains("plan")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    val fn = SparkEntry.queries(name)
    // warm run (codegen, file index)
    fn(spark, sfDir).queryExecution.toRdd.count()
    spark.catalog.clearCache()

    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int, Long, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms,
          si.numTasks,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val df = fn(spark, sfDir)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let listener drain
    println(f"[jobprof] $name total=$total%.3f s, ${stages.size} stages")
    println(f"${"stage"}%6s ${"ms"}%7s ${"tasks"}%6s ${"shufRd"}%10s ${"shufWr"}%10s  name")
    stages.sortBy(_._1).foreach { case (id, nm, ms, nt, rd, wr) =>
      println(f"$id%6d $ms%7d $nt%6d $rd%10d $wr%10d  $nm")
    }
    if (showPlan) println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
