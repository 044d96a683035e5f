package graft

import graft.functions.ZOrder64
import graft.sources.ClusteredLayout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpression}

/** Morton interleave correctness and the thing z-ordering is FOR:
  * row-group skipping on the non-leading dimension.
  */
class ZOrderSpec extends SparkSpec {

  test("bit interleave: known values, dimension recovery, masking") {
    // a=0b101 (bits at even positions), b=0b011 (odd positions)
    // → even: 1_0_1 → 0b010001, odd: 0_1_1 → 0b001010 shifted: 0b101010?
    // compute directly: dilate(5)=0b010001, dilate(3)=0b000101<<1=0b001010
    assert(ZOrder64.dilate(5L) == 0x11L)
    assert(ZOrder64.dilate(3L) == 0x5L)
    assert(ZOrder64.interleave(5L, 3L) == (0x11L | (0x5L << 1)))
    assert(ZOrder64.interleave(0L, 0L) == 0L)
    // only low 32 bits participate
    assert(ZOrder64.interleave(1L << 40, 0L) == 0L)
    // max 32-bit values fill the whole word
    assert(ZOrder64.interleave(0xFFFFFFFFL, 0xFFFFFFFFL) == -1L)
  }

  test("expression path equals the object method and stays codegen'd") {
    import spark.implicits._
    val df = Seq((5L, 3L), (123456L, 654321L), (0L, 0L)).toDF("a", "b")
      .select(col("a"), col("b"),
        toColumn(ZOrder64(toExpression(col("a")), toExpression(col("b")))).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrder64.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  /** Executes `build()` with AQE off (query stages hide the scan node
    * from plan.collect) and returns the parquet scan's output rows —
    * i.e. rows SURVIVING row-group min/max pruning + page filtering.
    */
  private def scanOutputRows(build: => DataFrame): Long = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = build
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no parquet scan in plan")
      scans.map(_.metrics("numOutputRows").value).sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("z-ordered layout prunes row groups on the non-leading dimension") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val zDir = SparkEnv.scratchDir("zorder-spec-z")
    val tDir = SparkEnv.scratchDir("zorder-spec-t")
    // 256 single-row-group files → a 16×16 (user, hour) pruning grid
    val (a, b) = ClusteredLayout.eventDims
    ClusteredLayout.zorderWrite(
      events, ClusteredLayout.scaledZKey(events, a, b), zDir, nFiles = 256)
    events.repartitionByRange(256, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(tDir)

    def userScan(dir: String): DataFrame =
      spark.read.parquet(dir)
        .filter(col("user_id").between(100, 109))
        .select(count(lit(1)).as("n"))

    val zRows = scanOutputRows(userScan(zDir))
    val tRows = scanOutputRows(userScan(tDir))
    val total = events.count()
    // time-sorted layout cannot skip on user_id: reads everything
    assert(tRows == total, s"expected full scan on time layout, got $tRows/$total")
    // z-ordered layout reads a small fraction
    assert(zRows * 4 <= total,
      s"expected >=4x row-group pruning, read $zRows of $total")
    // and both answer identically
    assert(userScan(zDir).head().getLong(0) == userScan(tDir).head().getLong(0))
  }

  test("clustered rewrite is lossless") {
    val raw = Tables.events(spark, sf)
    val path = ClusteredLayout.cachedZorderedEvents(spark, sf)
    val back = spark.read.parquet(path)
    assert(back.count() == raw.count())
    val a = raw.select("event_id", "user_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    val b = back.select("event_id", "user_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
