package graft.tools

import graft.{SparkEntry, SparkEnv}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Repartition, Sort}

/** Dev-only A/B for the round-10 perf hunt (VERDICT r9 task #3b): how
  * much of each query's exec time is the final global ORDER BY's
  * `Exchange rangepartitioning` (whose RangePartitioner pays a
  * SEPARATE sampling job over the child before the real shuffle)?
  * Three variants per query, warm, N passes, per-variant min:
  *
  *   declared  — the plan as shipped (global Sort at the root)
  *   single    — root Sort(global=true) → Repartition(1, shuffle=true)
  *               + Sort(global=false): same total order, no range
  *               sampling job, one-task final sort (valid for the
  *               small final outputs every declared query has)
  *   nosort    — root Sort removed entirely (lower bound: what the
  *               sort machinery costs including the exchange)
  */
object SortCostProf {
  private def rewriteRoot(plan: LogicalPlan,
      f: Sort => LogicalPlan): Option[LogicalPlan] = plan match {
    case s: Sort if s.global => Some(f(s))
    case p @ Project(_, s: Sort) if s.global =>
      Some(p.copy(child = f(s)))
    case _ => None
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "4").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_date_funcs", "q_semi_join", "q_setop", "q_events_hourly",
        "q_docs_by_lang", "q_pricing_summary")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }
    println(f"${"query"}%-30s ${"declared"}%9s ${"single"}%9s ${"coalesce"}%9s ${"nosort"}%9s")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val base = fn(spark, sfDir)
      val analyzed = base.queryExecution.analyzed
      val single = rewriteRoot(analyzed, s =>
        s.copy(global = false,
          child = Repartition(1, shuffle = true, s.child)))
      val coalesce1 = rewriteRoot(analyzed, s =>
        s.copy(global = false,
          child = Repartition(1, shuffle = false, s.child)))
      val nosort = rewriteRoot(analyzed, s => s.child)
      def time(plan: LogicalPlan): Double = {
        var best = Double.MaxValue
        for (_ <- 1 to passes) {
          spark.catalog.clearCache()
          val df = GraftSqlBridge.ofRows(spark, plan)
          val t0 = System.nanoTime()
          df.queryExecution.toRdd.count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        best
      }
      (single, coalesce1, nosort) match {
        case (Some(sp), Some(cp), Some(np)) =>
          val td = time(analyzed); val ts = time(sp)
          val tc = time(cp); val tn = time(np)
          println(f"$name%-30s $td%9.3f $ts%9.3f $tc%9.3f $tn%9.3f")
        case _ =>
          println(f"$name%-30s (no root global sort — skipped)")
      }
    }
    spark.stop()
  }
}
