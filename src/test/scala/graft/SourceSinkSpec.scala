package graft

import org.apache.spark.sql.functions._

/** Batch source/sink surface beyond parquet (SURVEY.md §2.A) and the
  * runtime bloom-filter join pruning that matters at 100 TB.
  */
class SourceSinkSpec extends SparkSpec {

  test("csv batch source round-trips lineitem with an explicit schema") {
    val dir = SparkEnv.scratchDir("csv-roundtrip")
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string")
      .option("header", "true").csv(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("json batch source round-trips events incl. timestamps") {
    val dir = SparkEnv.scratchDir("json-roundtrip")
    val src = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    // default JSON timestampFormat truncates to milliseconds; events
    // carry microseconds — pin a µs-precision format on both sides
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    src.write.mode("overwrite").option("timestampFormat", fmt).json(dir)
    val back = spark.read
      .schema("event_id long, ts timestamp, event_type string, value double")
      .option("timestampFormat", fmt)
      .json(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("xml batch source entity-escapes on write and unescapes on read") {
    // q_xml_source's fidelity claim rests on the writer actually
    // emitting &lt;/&amp;/&gt; for embedded XML-special characters —
    // assert the escape is PRESENT in the raw bytes, then that the
    // reader restores the original string exactly.
    val dir = SparkEnv.scratchDir("xml-roundtrip")
    val src = Tables.supplier(spark, sf)
      .select(col("s_suppkey"),
        concat(col("s_name"), lit(" <&> tail")).as("tag"))
    src.coalesce(1).write.mode("overwrite")
      .option("rowTag", "supplier").format("xml").save(dir)
    val raw = spark.read.text(dir)
    assert(raw.filter(col("value").contains("&lt;&amp;&gt;")).count() > 0,
      "expected entity-escaped <&> in the raw XML bytes")
    assert(raw.filter(col("value").contains(" <&> ")).count() == 0,
      "raw XML must not contain unescaped <&>")
    val back = spark.read.schema(src.schema)
      .option("rowTag", "supplier").format("xml").load(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join (no broadcast) and allow the filter on a
      // tiny probe side — at real scale these are the defaults' regime
      // (probe >= 10 GB); only the thresholds are test-sized here.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.lineitem(spark, sf)
      val pt = Tables.part(spark, sf).filter(col("p_brand") === "Brand#1")
      val joined = li.join(pt, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected an injected runtime bloom filter in:\n$plan")
      assert(joined.collect().head.getLong(0) > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
