package graft.tools

import graft.{SparkEnv, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: how much do the exact DECIMAL sums in
  * q_pricing_summary actually cost vs (a) exact scaled-LONG sums with
  * identical rounding semantics and (b) raw double sums (the
  * incorrect-but-fastest floor)? Informs whether the headline query
  * should switch its exactness mechanism.
  */
object PricingProf {

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))

  def decimalForm(s: SparkSession, d: String): DataFrame = {
    val li = base(s, d)
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,4)")).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .cast("decimal(24,6)")).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  def scaledLongForm(s: SparkSession, d: String): DataFrame = {
    val li = base(s, d)
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 1e4)
          .cast("long")) / 1e4).as("sum_disc_price"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")) * 1e6).cast("long")) / 1e6).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  def doubleForm(s: SparkSession, d: String): DataFrame = {
    val li = base(s, d)
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { spark.range(1000).selectExpr("sum(id)").count(); graft.Bench.warmCpu(spark) }
    catch { case _: Throwable => }
    val variants = Seq[(String, (SparkSession, String) => DataFrame)](
      "decimal" -> decimalForm, "scaled-long" -> scaledLongForm,
      "double" -> doubleForm)
    for (p <- 1 to 3; (name, v) <- variants) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      v(spark, sfDir).queryExecution.toRdd.count()
      println(f"[pricing] pass $p $name%-12s t=${(System.nanoTime() - t0) / 1e9}%6.3f")
    }
    // value parity check: scaled-long must equal decimal bit-for-bit
    val a = decimalForm(spark, sfDir).orderBy("l_returnflag", "l_linestatus").collect()
    val b = scaledLongForm(spark, sfDir).orderBy("l_returnflag", "l_linestatus").collect()
    println(s"[pricing] parity decimal==scaledlong: ${a.sameElements(b)}")
    spark.stop()
  }
}
