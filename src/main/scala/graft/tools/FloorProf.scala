package graft.tools

import graft.{SparkEntry, SparkEnv}
import org.apache.spark.scheduler._

/** Dev tool (round 13, VERDICT r12 #1): decompose the ~0.15–0.3 s
  * PER-ACTION floor that dominates every sub-second query at sf0.1 —
  * the thing keeping the batch-excl-artifact cut at 1.48× and
  * q_brand_affinity above 2×. For a ladder of probes from "empty
  * action" up to real declared queries, measures per repetition:
  *
  *   - wall time (min over reps, warm)
  *   - Catalyst phase times from QueryPlanningTracker
  *     (analysis / optimization / physical planning)
  *   - jobs / stages / tasks submitted (AQE's per-stage jobs show up
  *     here), sum of task run time, sum of scheduler delay
  *     (task launch − stage submit) and deserialize time
  *
  * wall − plan − taskRun ≈ the scheduler/codegen/barrier floor.
  * Conf A/B goes through SPARK_GRAFT_EXTRA_CONF (static confs like
  * spark.locality.wait need a fresh JVM anyway).
  *
  *   sbt "runMain graft.tools.FloorProf [probe ...]"
  */
object FloorProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)

    // ladder: scheduling-only → task fan-out → shuffle → scan → queries
    val probes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("noop_1task", () => spark.range(1).selectExpr("id")),
      ("noop_32task", () => spark.range(0, 32000, 1, 32).selectExpr("sum(id) AS s")),
      ("shuffle_tiny", () => spark.range(0, 1000, 1, 8)
        .groupBy(org.apache.spark.sql.functions.expr("id % 7")).count()),
      ("scan_region", () => graft.Tables.region(spark, sfDir)),
      ("bcast_join", () => {
        import org.apache.spark.sql.functions._
        graft.Tables.nation(spark, sfDir)
          .join(broadcast(graft.Tables.region(spark, sfDir)),
            col("n_regionkey") === col("r_regionkey")).groupBy("r_name").count()
      }),
      ("q_union_distinct", () => SparkEntry.queries("q_union_distinct")(spark, sfDir)),
      ("q_brand_affinity", () => SparkEntry.queries("q_brand_affinity")(spark, sfDir)))
    val wanted = if (args.nonEmpty) probes.filter(p => args.contains(p._1)) else probes

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskRunMs = 0L
    @volatile var schedDelayMs = 0L
    @volatile var deserMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskRunMs += m.executorRunTime
          deserMs += m.executorDeserializeTime
        }
        val ti = t.taskInfo
        // duration − run − deserialize: pure launch/result overhead
        // (leaving deserialize in here double-counted it vs the deser
        // column — round-13 review)
        if (ti != null) schedDelayMs += math.max(0L,
          ti.duration - (if (m != null)
            m.executorRunTime + m.executorDeserializeTime else 0L))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    println(f"${"probe"}%-18s ${"wall_ms"}%8s ${"plan_ms"}%8s ${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s ${"taskRun"}%8s ${"sched"}%6s ${"deser"}%6s ${"floor"}%7s")
    for ((name, mk) <- wanted) {
      // warm twice (codegen compile + file index), then measure 5 reps
      (1 to 2).foreach { _ =>
        spark.catalog.clearCache(); mk().queryExecution.toRdd.count()
      }
      val reps = (1 to 5).map { _ =>
        spark.catalog.clearCache()
        jobs = 0; stages = 0; tasks = 0; taskRunMs = 0; schedDelayMs = 0; deserMs = 0
        val df = mk()
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val wallMs = (System.nanoTime() - t0) / 1e6
        // drain the listener bus until task counts stop moving (a fixed
        // short sleep undercounted taskRun under load and overstated
        // the derived floor — round-13 review); cap at 2 s
        var last = -1
        var waited = 0
        while (tasks != last && waited < 2000) {
          last = tasks; Thread.sleep(100); waited += 100
        }
        val planMs = df.queryExecution.tracker.phases.values
          .map(p => p.endTimeMs - p.startTimeMs).sum
        (wallMs, planMs, jobs, stages, tasks, taskRunMs, schedDelayMs, deserMs)
      }
      val best = reps.minBy(_._1)
      val floor = best._1 - best._2 - best._6
      println(f"$name%-18s ${best._1}%8.1f ${best._2}%8d ${best._3}%5d ${best._4}%4d ${best._5}%6d ${best._6}%8d ${best._7}%6d ${best._8}%6d $floor%7.1f")
    }
    spark.stop()
  }
}
