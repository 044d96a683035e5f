package graft

import graft.operators.Similarity
import graft.streaming.AnnServing
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN serving probes the persisted IVF-PQ artifacts and
  * returns exactly what the batch probe returns for the same queries.
  */
object AnnServingSpec {
  case class Query(vec_id: Long, embedding: Array[Float])
}

class AnnServingSpec extends SparkSpec {
  import AnnServingSpec.Query

  test("served stream results equal the batch IVF-PQ probe per query batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val index = Similarity.cachedIvfIndex(spark, emb, sf).get
    val model = Similarity.cachedPqModel(emb, sf).get
    val coded = Similarity.cachedIvfPqCodes(spark, index, sf, model)
    // probe plan over the artifacts never re-encodes the corpus
    assert(!Similarity.ivfPqTopK(index, model,
        emb.filter(col("vec_id") < 2), k = 3, codedRel = Some(coded))
      .queryExecution.executedPlan.toString.contains("pq_encode"))

    val queries = emb.filter(col("vec_id") < 8)
      .select("vec_id", "embedding").as[Query].collect()
    val expected = Similarity.ivfPqTopK(index, model,
        emb.filter(col("vec_id") < 8), k = 3, codedRel = Some(coded))
      .select("q_id", "vec_id", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)

    val collected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mem = MemoryStream[Query]
    val q = AnnServing.serve(mem.toDF(), index, model, coded,
      SparkEnv.scratchDir("ann-serving-ckpt")) { (res, _) =>
      collected ++= res.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    // two serving batches; each is answered completely + independently
    val (b1, b2) = queries.partition(_.vec_id < 4)
    mem.addData(b1.toSeq)
    q.processAllAvailable()
    mem.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()
    assert(collected.toSet == expected,
      s"missing=${(expected -- collected.toSet).take(5)} " +
        s"extra=${(collected.toSet -- expected).take(5)}")
  }
}
