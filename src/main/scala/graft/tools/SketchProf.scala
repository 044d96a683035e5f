package graft.tools
import graft.{SparkEnv, Tables}
import org.apache.spark.sql.functions._
object SketchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.warmCpu(spark)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime()-t0)/1e9}%7.3f s rows=$r")
    }
    def q() = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"),
        date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("m"))
      .agg(graft.functions.QuantileSketch.quantile_sketch(col("l_extendedprice"), Seq(0.5,0.9,0.99)).as("p"))
    for (thr <- Seq("128", "4096"); pass <- 1 to 2) {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      time(s"sketch month-group thr=$thr pass=$pass")(q().queryExecution.toRdd.count())
    }
    // 3-group variant for reference
    def q3() = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(graft.functions.QuantileSketch.quantile_sketch(col("l_extendedprice"), Seq(0.5,0.9,0.99)).as("p"))
    for (pass <- 1 to 2) time(s"sketch 3-group pass=$pass")(q3().queryExecution.toRdd.count())
    // plain exact percentile month-group for scan+group baseline
    def qp() = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("m"))
      .agg(expr("percentile(l_extendedprice, 0.5)"))
    for (pass <- 1 to 2) time(s"exact percentile month-group pass=$pass")(qp().queryExecution.toRdd.count())
    spark.stop()
  }
}
