package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest (SURVEY.md §2 A2-A5, §3.1): the reference's
  * ZMQ-SUB JSON loop re-expressed as Structured Streaming sources +
  * from_json decode. No ZMQ/Kafka exists in this environment
  * (BASELINE.md) — the file source is the production-shaped stand-in
  * (same micro-batch machinery, offsets, and recovery semantics as a
  * Kafka source; swapping `format`/`option` is the only change).
  */
object Ingest {

  /** Typed event (the reference's JSON tracking event). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Raw-wire schema: what a ZMQ/Kafka payload would decode to. */
  val eventJsonSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts_us", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Parquet-side schema, parameterized on the fixture's physical
    * timestamp type — the driver has shipped both timestamp[ns] (reads
    * as LongType under `nanosAsLong`) and timestamp[us]
    * (isAdjustedToUTC=false → TimestampNTZType); see Tables.events.
    */
  private def eventFileSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source event stream over a fixture dir — the streaming twin
    * of Tables.events: same columns, same µs timestamp normalization.
    */
  /** Stream one parquet table that may be EITHER a bare file (fixture
    * layout) or a directory of part files (the layout any real writer
    * produces). Each idiom fails on the other layout — FileStreamSource
    * requires its basePath to be a DIRECTORY (a file path throws),
    * while a `pathGlobFilter` over the parent matches LEAF file names
    * only (a directory table silently ingests ZERO rows) — so pick per
    * realized layout. StreamingSpec pins the directory case; every
    * fixture run pins the file case.
    */
  private[graft] def streamTable(spark: SparkSession, sfDir: String,
      table: String, schema: StructType): DataFrame = {
    val path = new java.io.File(s"$sfDir/$table.parquet")
    // ingestion batching knob (a real file-watch deployment always
    // sets one): bounds files admitted per micro-batch, which is also
    // how tools/StreamAmortProf drives N>1 micro-batches over a
    // chunked fixture to measure marginal batch cost. Unset (the
    // default) = all available files in one AvailableNow batch.
    // Session conf wins; the sys.prop is the DEV fallback for
    // harnesses whose streams run on an isolated newSession() that
    // does not inherit the caller's runtime conf (StreamAmortProf's
    // stateSession pattern). Conf-first so a harness sys.prop leaked
    // by a failed finally-cleanup can never silently override an
    // explicitly configured production stream (advisor r10).
    val maxFiles = spark.conf.getOption("spark.graft.stream.maxFilesPerTrigger")
      .orElse(sys.props.get("graft.stream.maxFilesPerTrigger"))
    def withKnob(r: org.apache.spark.sql.streaming.DataStreamReader) =
      maxFiles.fold(r)(v => r.option("maxFilesPerTrigger", v))
    if (path.isDirectory)
      withKnob(spark.readStream.schema(schema)).parquet(path.getPath)
    else withKnob(spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet")).parquet(sfDir)
  }

  /** Unit-aware like Tables.events: readStream needs an explicit
    * schema, so peek at the footer-derived type with a (metadata-only)
    * batch read first, then declare the matching stream schema and
    * normalize `ts` to µs TimestampType. One extra file listing per
    * stream start — nothing per micro-batch.
    */
  def eventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val physical = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val raw = streamTable(spark, sfDir, "events", eventFileSchema(physical))
    physical match {
      case LongType => // ns surfaced as raw long under nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Decode a stream of JSON strings (the ZMQ datagram shape) into
    * typed event columns — A5. `payload` column in, event columns out.
    */
  def decodeJson(raw: DataFrame): DataFrame =
    raw.select(from_json(col("payload"), eventJsonSchema).as("e"))
      .select(
        col("e.event_id").as("event_id"),
        timestamp_micros(col("e.ts_us")).as("ts"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"))

  /** Encode events back to wire JSON (round-trip / A4 load-gen). */
  def encodeJson(events: DataFrame): DataFrame =
    events.select(to_json(struct(
      col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props"))).as("payload"))
}
