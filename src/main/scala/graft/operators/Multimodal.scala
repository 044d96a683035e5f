package graft.operators

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (prompt requirement): image/audio/video
  * as opaque binary columns with typed metadata, flowing through real
  * Spark plans — schema, partitioning, and per-partition batch shape
  * are production-shaped; only the media *decode* itself is stubbed
  * (this container has no image/audio libraries).
  *
  * The binary payloads are derived deterministically from fixture text
  * (a stand-in for real blobs); `decodeImageStub` parses a fake 8-byte
  * header [magic:4][w:2][h:2] that `asFakeImage` lays down, exactly
  * how a real decoder would parse PNG/JPEG dimensions. Swap
  * `decodeImageStub` for a real codec (e.g. javax.imageio inside
  * `mapPartitions`) and nothing else changes.
  */
object Multimodal {

  case class ImageMeta(doc_id: Long, width: Int, height: Int,
      format: String, n_bytes: Int)

  /** Attach a fake binary payload with a parseable header. */
  def asFakeImage(docs: DataFrame): DataFrame =
    docs.withColumn("payload",
      concat(
        lit("IMG0").cast("binary"),
        // big-endian u16 width/height derived from doc stats
        expr("unhex(lpad(hex(pmod(n_chars, 1024) + 16), 4, '0'))"),
        expr("unhex(lpad(hex(pmod(doc_id, 1024) + 16), 4, '0'))"),
        col("text").cast("binary")))

  /** STUB decode (clearly marked): parses the fake header the way a
    * real decoder parses an image container. Runs per-partition over
    * the binary column — the exact batch shape a real codec UDF needs.
    */
  def decodeImageStub(spark: SparkSession, withPayload: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    withPayload.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val magicOk = bytes.length >= 8 &&
            bytes(0) == 'I' && bytes(1) == 'M' && bytes(2) == 'G' && bytes(3) == '0'
          val w = if (magicOk) ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff) else -1
          val h = if (magicOk) ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff) else -1
          ImageMeta(id, w, h, if (magicOk) "img0" else "unknown", bytes.length)
        }
      }
  }

  /** Frame sampling for "video" payloads: every `stride`-th byte block
    * — the partition-local slicing pattern real frame extraction uses.
    */
  def sampleFrames(withPayload: DataFrame, frameSize: Int = 16, stride: Int = 4): DataFrame =
    withPayload.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, CAST((octet_length(payload) - $frameSize) / ($frameSize * $stride) AS INT)), " +
          s"i -> substring(payload, i * $frameSize * $stride + 1, $frameSize))")).as(Seq("frame_no", "frame")))

  // ---- declared queries ----

  /** Decoded metadata aggregate. The decode itself is the stub above;
    * the header fields are deterministic, so this carries a real
    * oracle that recomputes them in SQL — proving the binary plumbing
    * end-to-end.
    */
  val qImageMeta = DeclaredQuery(
    "q_multimodal_decode",
    """SELECT format, count(*) AS n,
      |  sum(width) AS sum_w, sum(height) AS sum_h,
      |  sum(n_bytes) AS sum_bytes
      |FROM (
      |  SELECT 'img0' AS format,
      |         (n_chars % 1024) + 16 AS width,
      |         (doc_id % 1024) + 16 AS height,
      |         8 + octet_length(encode(text)) AS n_bytes
      |  FROM documents) t
      |GROUP BY format
      |ORDER BY format""".stripMargin) { (s, d) =>
    decodeImageStub(s, asFakeImage(Tables.documents(s, d)))
      .groupBy("format")
      .agg(
        count(lit(1)).as("n"),
        sum("width").as("sum_w"), sum("height").as("sum_h"),
        sum("n_bytes").as("sum_bytes"))
      .orderBy("format")
  }

  /** Frame-sampling plumbing: frames per doc (rows-only check;
    * ScalaTest pins exact frame counts and byte content).
    */
  val qFrames = DeclaredQuery.noOracle("q_multimodal_frames") { (s, d) =>
    sampleFrames(asFakeImage(Tables.documents(s, d)))
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      .orderBy("doc_id")
  }

  val all: Seq[DeclaredQuery] = Seq(qImageMeta, qFrames)
}
