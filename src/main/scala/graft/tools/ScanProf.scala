package graft.tools
import graft.{SparkEnv, Tables}
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the q_pricing_summary floor: what do the
  * scan, decode, aggregate, and exchange layers each cost at sf0.1?
  */
object ScanProf {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.warmCpu(spark)
    def time(label: String)(f: => Any): Unit = {
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime(); f
        println(f"[prof] $label%-44s pass$p ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    val li = Tables.lineitem(spark, sfDir)
    time("count (footer only)")(li.count())
    time("scan 1 col sum")(li.agg(sum("l_quantity")).collect())
    time("scan 7 col sums")(li.agg(sum("l_quantity"), sum("l_extendedprice"),
      sum("l_discount"), sum("l_tax"), min("l_shipdate"), max("l_returnflag"),
      max("l_linestatus")).collect())
    time("groupBy 2 keys, plain double sums")(
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice")).collect())
    time("full q_pricing_summary")(
      graft.SparkEntry.queries("q_pricing_summary")(spark, sfDir)
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
