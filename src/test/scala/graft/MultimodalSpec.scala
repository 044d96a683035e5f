package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Binary-column plumbing: fake header encode → stub decode roundtrip,
  * frame sampling shape.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("decode stub recovers header fields exactly") {
    val decoded = Multimodal.decodeImageStub(spark, Multimodal.asFakeImage(docs))
    val joined = decoded.toDF().join(docs, Seq("doc_id"))
    val bad = joined.filter(
      col("width") =!= (col("n_chars") % 1024 + 16) ||
      col("height") =!= (col("doc_id") % 1024 + 16) ||
      col("format") =!= "img0" ||
      col("n_bytes") =!= (length(col("text")) + 8))
    assert(bad.count() == 0)
    assert(decoded.count() == docs.count())
  }

  test("corrupt payload decodes as unknown, not crash") {
    import spark.implicits._
    val corrupt = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val r = Multimodal.decodeImageStub(spark, corrupt).collect()
    assert(r.head.format == "unknown" && r.head.width == -1)
  }

  test("resize halves header dims and downsamples the body") {
    val resized = Multimodal.resizeStub(spark, Multimodal.asFakeImage(docs))
    val decoded = Multimodal.decodeImageStub(spark, resized)
    val joined = decoded.toDF().join(docs, Seq("doc_id"))
    val bad = joined.filter(
      col("width") =!= expr("(n_chars % 1024 + 16) div 2") ||
      col("height") =!= expr("(doc_id % 1024 + 16) div 2") ||
      col("format") =!= "img0" ||
      col("n_bytes") =!= expr("8 + (length(text) + 1) div 2"))
    assert(bad.count() == 0)
  }

  test("feature extraction: L1-normalized 16-bin histogram") {
    val feats = Multimodal.extractFeaturesStub(
      spark, Multimodal.asFakeImage(docs.limit(20)))
    assert(feats.filter(size(col("feature")) =!= 16).count() == 0)
    val l1 = feats.select(
      expr("aggregate(feature, CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("l1"))
    assert(l1.filter(abs(col("l1") - 1.0) > 0.001).count() == 0)
    // lowercase-alnum fixture text lives in the 0x60-0x7f nibble bins
    val mass = feats.select(
      expr("feature[6] + feature[7]").as("m"))
    assert(mass.filter(col("m") < 0.5).count() == 0)
  }

  test("frame sampling yields expected count and frame width") {
    val frames = Multimodal.sampleFrames(Multimodal.asFakeImage(docs.limit(10)))
    val withLen = frames.withColumn("flen", length(col("frame")))
    assert(withLen.filter(col("flen") =!= 16 && col("frame_no") =!= col("frame_no")).count() == 0)
    // every sampled doc yields >= 1 frame; frame_no is dense from 0
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"), min("frame_no").as("mn"))
    assert(perDoc.filter(col("n") < 1 || col("mn") =!= 0).count() == 0)
  }
}
