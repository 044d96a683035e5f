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

  /** THE header layout of the fake IMG0 container — magic (4 bytes) +
    * big-endian u16 width/height. Every stub parses/writes dims
    * through here, so a format change (e.g. swapping in a real codec)
    * lands in one place.
    */
  private def magicOk(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      bytes(0) == 'I' && bytes(1) == 'M' && bytes(2) == 'G' && bytes(3) == '0'
  private def readDims(bytes: Array[Byte]): (Int, Int) =
    ((((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)),
      (((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)))
  private def writeDims(bytes: Array[Byte], w: Int, h: Int): Unit = {
    bytes(4) = ((w >> 8) & 0xff).toByte; bytes(5) = (w & 0xff).toByte
    bytes(6) = ((h >> 8) & 0xff).toByte; bytes(7) = (h & 0xff).toByte
  }

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
    withPayload.select("doc_id", "payload")
      // NULL payloads (NULL source text) are skipped like every
      // sibling operator skips NULL text — the lambdas below would
      // otherwise NPE on the null byte array (round-14 review);
      // sampleFrames gets the same behavior free via octet_length
      .filter(col("payload").isNotNull).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ok = magicOk(bytes)
          val (w, h) = if (ok) readDims(bytes) else (-1, -1)
          ImageMeta(id, w, h, if (ok) "img0" else "unknown", bytes.length)
        }
      }
  }

  /** Frame sampling for "video" payloads: every `stride`-th byte block
    * OF THE BODY — the 8-byte container header is metadata, not frame
    * data, so sampling starts past it (a real extractor samples the
    * elementary stream, not the container header), and only FULL
    * frames are emitted (payloads whose body is shorter than one
    * frame produce no rows rather than a truncated header-fragment).
    */
  def sampleFrames(withPayload: DataFrame, frameSize: Int = 16, stride: Int = 4): DataFrame = {
    // stride/frameSize = 0 would make the non-ANSI division NULL out
    // the sequence and silently drop every row — reject loudly
    require(frameSize > 0 && stride > 0,
      s"sampleFrames: frameSize=$frameSize and stride=$stride must be positive")
    withPayload
      .filter(expr(s"octet_length(payload) >= ${8 + frameSize}"))
      .select(
        col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST((octet_length(payload) - 8 - $frameSize) / ($frameSize * $stride) AS INT)), " +
            s"i -> substring(payload, 9 + i * $frameSize * $stride, $frameSize))")).as(Seq("frame_no", "frame")))
  }

  /** Resize for the fake format: keep the header, rewrite the dims to
    * (w/k, h/k), and downsample the body by taking every k-th byte —
    * the same payload-in/payload-out shape a real thumbnailer has
    * (swap the byte-skip for an interpolating codec and nothing else
    * changes). Stays a DataFrame→DataFrame op so resized payloads flow
    * into the same decode/frame-sample plumbing.
    */
  def resizeStub(spark: SparkSession, withPayload: DataFrame, k: Int = 2): DataFrame = {
    import spark.implicits._
    withPayload.select("doc_id", "payload")
      // NULL payloads (NULL source text) are skipped like every
      // sibling operator skips NULL text — the lambdas below would
      // otherwise NPE on the null byte array (round-14 review);
      // sampleFrames gets the same behavior free via octet_length
      .filter(col("payload").isNotNull).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          if (bytes.length < 8) (id, bytes)
          else {
            val (w0, h0) = readDims(bytes)
            val body = bytes.drop(8).grouped(k).map(_.head).toArray
            val out = new Array[Byte](8 + body.length)
            System.arraycopy(bytes, 0, out, 0, 8)
            writeDims(out, w0 / k, h0 / k)
            System.arraycopy(body, 0, out, 8, body.length)
            (id, out)
          }
        }
      }.toDF("doc_id", "payload")
  }

  /** Feature extraction over the binary payload: a 16-bin byte
    * histogram, L1-normalized — a deterministic stand-in for an image
    * embedding model, with the exact batch shape a real extractor
    * needs (bytes in → Array[Float] out, per partition). The output
    * column is the same ArrayType(FloatType) as `embeddings.embedding`,
    * so extracted features compose with the Similarity operators.
    */
  def extractFeaturesStub(spark: SparkSession, withPayload: DataFrame): DataFrame = {
    import spark.implicits._
    withPayload.select("doc_id", "payload")
      // NULL payloads (NULL source text) are skipped like every
      // sibling operator skips NULL text — the lambdas below would
      // otherwise NPE on the null byte array (round-14 review);
      // sampleFrames gets the same behavior free via octet_length
      .filter(col("payload").isNotNull).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Float](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
          val n = math.max(1, bytes.length).toFloat
          (id, hist.map(_ / n))
        }
      }.toDF("doc_id", "feature")
  }

  // ---- declared queries ----

  /** Decoded metadata aggregate. The decode itself is the stub above;
    * the header fields are deterministic, so this carries a real
    * oracle that recomputes them in SQL — proving the binary plumbing
    * end-to-end.
    */
  // both oracles filter NULL text like the Spark side's payload
  // isNotNull (round-15 review — the q_binary_source discipline): a
  // regenerated fixture with a NULL-text doc must not split the engines
  val qImageMeta = DeclaredQuery(
    "q_multimodal_decode",
    """SELECT format, count(*) AS n,
      |  CAST(sum(width) AS BIGINT) AS sum_w, CAST(sum(height) AS BIGINT) AS sum_h,
      |  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
      |FROM (
      |  SELECT 'img0' AS format,
      |         (n_chars % 1024) + 16 AS width,
      |         (doc_id % 1024) + 16 AS height,
      |         8 + octet_length(encode(text)) AS n_bytes
      |  FROM documents WHERE text IS NOT NULL) t
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

  /** Frame-sampling plumbing, hash-gated (round-7 verdict #9): the
    * sampler emits full 16-byte frames at stride 4 over the payload
    * BODY (64-byte block step), so frames per doc is the closed form
    * ⌊(|body| − 16) / 64⌋ + 1 for bodies ≥ one frame — which the
    * oracle recomputes from `encode(text)` byte lengths. ScalaTest
    * additionally pins frame byte CONTENT (not just counts).
    */
  val qFrames = DeclaredQuery(
    "q_multimodal_frames",
    """SELECT doc_id,
      |  CAST((octet_length(encode(text)) - 16) // 64 + 1 AS BIGINT) AS n_frames
      |FROM documents
      |WHERE octet_length(encode(text)) >= 16
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    sampleFrames(asFakeImage(Tables.documents(s, d)))
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      .orderBy("doc_id")
  }

  /** Resize → decode: header dims are integer-halved by the resize,
    * which the oracle recomputes in SQL — the full binary round trip
    * (encode → resize → decode) is hash-gated.
    */
  val qResize = DeclaredQuery(
    "q_multimodal_resize",
    """SELECT format, count(*) AS n,
      |  CAST(sum(width) AS BIGINT) AS sum_w, CAST(sum(height) AS BIGINT) AS sum_h,
      |  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
      |FROM (
      |  SELECT 'img0' AS format,
      |         ((n_chars % 1024) + 16) // 2 AS width,
      |         ((doc_id % 1024) + 16) // 2 AS height,
      |         8 + (octet_length(encode(text)) + 1) // 2 AS n_bytes
      |  FROM documents WHERE text IS NOT NULL) t
      |GROUP BY format
      |ORDER BY format""".stripMargin) { (s, d) =>
    decodeImageStub(s, resizeStub(s, asFakeImage(Tables.documents(s, d))))
      .groupBy("format")
      .agg(
        count(lit(1)).as("n"),
        sum("width").as("sum_w"), sum("height").as("sum_h"),
        sum("n_bytes").as("sum_bytes"))
      .orderBy("format")
  }

  /** Extracted features' invariants, hash-gated (round-7 verdict #9):
    * the byte histogram is deterministic, so the oracle rebuilds the
    * SAME fake payload as a DuckDB blob ('IMG0' ‖ dim bytes ‖
    * encode(text)), explodes its bytes, and recomputes the high-nibble
    * histogram — L1 norm (Σ float32(cnt/n), rounded) and the argmax
    * bin (first max under ties ≡ min bin index with the max count;
    * integer counts divided by one total preserve order in float32 at
    * these magnitudes). ScalaTest pins raw histogram values; this gate
    * proves the binary plumbing against an independent engine.
    */
  val qFeatures = DeclaredQuery(
    "q_multimodal_features",
    """WITH p AS (
      |  SELECT doc_id,
      |         hex('IMG0'::BLOB
      |           || unhex(lpad(hex((n_chars % 1024) + 16), 4, '0'))
      |           || unhex(lpad(hex((doc_id % 1024) + 16), 4, '0'))
      |           || encode(text)) AS hx
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, len(hx) // 2 AS n,
      |         instr('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1 AS bin
      |  FROM p, LATERAL (
      |    SELECT unnest(generate_series(1, len(hx) // 2)) AS i) s),
      |h AS (SELECT doc_id, n, bin, count(*) AS cnt FROM b GROUP BY 1, 2, 3)
      |SELECT doc_id,
      |       round(sum(CAST(CAST(cnt AS FLOAT) / CAST(n AS FLOAT) AS DOUBLE)), 3) AS l1,
      |       CAST(min(bin) FILTER (WHERE cnt = mx) + 1 AS BIGINT) AS argmax_bin
      |FROM (SELECT *, max(cnt) OVER (PARTITION BY doc_id) AS mx FROM h)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val feats = extractFeaturesStub(s, asFakeImage(Tables.documents(s, d)))
    feats.select(col("doc_id"),
      round(expr("aggregate(feature, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"), 3).as("l1"),
      expr("array_position(feature, array_max(feature))").as("argmax_bin"))
      .orderBy("doc_id")
  }

  val all: Seq[DeclaredQuery] = Seq(qImageMeta, qFrames, qResize, qFeatures)
}
