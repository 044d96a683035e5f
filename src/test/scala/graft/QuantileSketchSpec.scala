package graft

import graft.functions.{QuantileSketch, QuantileSketchAggregator}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: rank-error bound vs exact quantiles,
  * exactness below capacity, merge algebra, and the streaming
  * multi-batch path.
  */
class QuantileSketchSpec extends SparkSpec {

  /** Rank of `v` in sorted `xs` (first index with xs(i) >= v). */
  private def rankOf(xs: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(xs, v)
    if (i >= 0) i else -i - 1
  }

  test("rank error within 2% of n at k=256 on fixture prices") {
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    val got = Tables.lineitem(spark, sf)
      .agg(QuantileSketch.quantile_sketch(
        col("l_extendedprice"), Seq(0.1, 0.5, 0.9, 0.99)).as("p"))
      .head().getSeq[Double](0)
    got.zip(Seq(0.1, 0.5, 0.9, 0.99)).foreach { case (v, q) =>
      val err = math.abs(rankOf(vals, v) - q * n)
      assert(err <= 0.02 * n, s"q=$q: value $v rank-off by $err (n=$n)")
    }
  }

  test("exact below capacity: <2k inputs reproduce nearest-rank percentiles") {
    import spark.implicits._
    val xs = (1 to 400).map(_.toDouble)
    val got = xs.toDF("v")
      .agg(QuantileSketch.quantile_sketch(col("v"), Seq(0.25, 0.5, 1.0), k = 256))
      .head().getSeq[Double](0)
    assert(got == Seq(100.0, 200.0, 400.0))
  }

  test("merge algebra: partition layout does not break the bound") {
    val qs = Seq(0.5, 0.9)
    val one = Tables.lineitem(spark, sf).coalesce(1)
      .agg(QuantileSketch.quantile_sketch(col("l_extendedprice"), qs))
      .head().getSeq[Double](0)
    val many = Tables.lineitem(spark, sf).repartition(13)
      .agg(QuantileSketch.quantile_sketch(col("l_extendedprice"), qs))
      .head().getSeq[Double](0)
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    Seq(one, many).foreach { res =>
      res.zip(qs).foreach { case (v, q) =>
        assert(math.abs(rankOf(vals, v) - q * n) <= 0.02 * n)
      }
    }
  }

  test("nulls are skipped like percentile") {
    import spark.implicits._
    val got = Seq[java.lang.Double](1.0, null, 2.0, null, 3.0).toDF("v")
      .agg(QuantileSketch.quantile_sketch(col("v"), Seq(0.5)))
      .head().getSeq[Double](0)
    assert(got == Seq(2.0))
  }

  test("state stays bounded: buffer size O(k log(n/k)) not O(n)") {
    val agg = new QuantileSketchAggregator(64, Array(0.5))
    var buf = agg.zero
    (1 to 100000).foreach(i => buf = agg.reduce(buf, i.toDouble))
    // logical content: level-0 fill (n0; its physical array is an
    // amortized capacity buffer) + exact-length upper levels
    val held = buf.n0 + buf.levels.drop(1).map(_.length).sum
    assert(held <= 64 * 2 * buf.levels.length,
      s"sketch holds $held values over ${buf.levels.length} levels for 100k inputs")
    assert(buf.levels.length <= 14)
    // amortized capacity never exceeds the compaction threshold
    assert(buf.levels(0).length <= 2 * 64)
  }

  test("streaming two-batch aggregation stays within the rank bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0))
    val (b1, b2) = vals.splitAt(vals.length / 2)
    val mem = MemoryStream[Double]
    val q = mem.toDF().toDF("v")
      .agg(QuantileSketch.quantile_sketch(col("v"), Seq(0.5, 0.9)).as("p"))
      .writeStream.format("memory").queryName("qsketch_stream")
      .outputMode("complete")
      .option("checkpointLocation", SparkEnv.scratchDir("qsketch-ckpt"))
      .start()
    mem.addData(b1.toSeq)
    q.processAllAvailable()
    mem.addData(b2.toSeq)
    q.processAllAvailable()
    val got = spark.table("qsketch_stream").head().getSeq[Double](0)
    q.stop()
    val sorted = vals.sorted
    val n = sorted.length
    got.zip(Seq(0.5, 0.9)).foreach { case (v, qq) =>
      assert(math.abs(rankOf(sorted, v) - qq * n) <= 0.02 * n,
        s"stream q=$qq off by ${math.abs(rankOf(sorted, v) - qq * n)}")
    }
  }
}
