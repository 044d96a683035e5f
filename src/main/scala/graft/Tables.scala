package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table loaders (FIXTURES.md).
  *
  * Schemas come from the parquet footers (driver-generated,
  * deterministic); we deliberately do NOT re-declare StructTypes here —
  * the footer is authoritative and a drifted in-code schema would mask
  * errors. `TableSchemas` (test side) asserts the expected shape.
  *
  * Scale note: each fixture is a single parquet file, but nothing here
  * assumes that — `spark.read.parquet(dir)` handles a 100 TB
  * multi-file layout identically, and all downstream operators are
  * declarative DataFrame ops that let Catalyst push filters/pruning
  * into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet timestamp[ns], which Spark 4 refuses to read
    * as TimestampType. Reading with an explicit schema that types `ts`
    * as LongType works on any session (no legacy config needed): the
    * physical parquet type is INT64, so the vectorized reader hands us
    * raw ns-since-epoch. We convert to µs TimestampType with exact
    * integer division (`div` — no double round-trip, which would lose
    * precision above 2^53 ns). Downstream queries see a real timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    s.read.schema(schema).parquet(s"$d/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
