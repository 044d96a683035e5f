package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: the HNSW ef-vs-recall trade-off at production-shaped
  * shard counts (round-13, VERDICT r12 #4b). The q_ann_hnsw gate's
  * exact-top-k oracle is sound ONLY in the recall==1.0 regime that
  * AnnRecallSpec pins at the graded parameters (ef=48, 4 shards); this
  * sweep measures where recall LEAVES 1.0 as ef shrinks and shards
  * multiply — the non-exhaustive regime a 100 TB deployment actually
  * runs in — so the curve published in ANN_RECALL.md is measured, not
  * asserted. Recall is against the exact q_cosine_topk twin (same
  * query set vec_id < 5, k = 3).
  *
  *   sbt "runMain graft.tools.HnswCurve"
  */
object HnswCurve {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val emb = graft.Tables.embeddings(spark, d)
    val exact = graft.SparkEntry.queries("q_cosine_topk")(spark, d)
      .select(col("q_id").cast("long"), col("vec_id").cast("long")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val queries = emb.filter(col("vec_id") < 5)
    println("| shards | ef=2 | ef=4 | ef=8 | ef=16 | ef=48 |")
    println("|---|---|---|---|---|---|")
    for (shards <- Seq(4, 16, 64)) {
      val g = graft.operators.Hnsw.buildShardGraphs(emb, shards)
        .localCheckpoint()
      val cells = Seq(2, 4, 8, 16, 48).map { ef =>
        val approx = graft.operators.Hnsw.annHnsw(g, queries, 3, ef)
          .select(col("q_id"), col("vec_id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val rec = exact.map { case (q, ex) =>
          approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
        }
        f"${rec.sum / rec.size}%.3f"
      }
      println(s"| $shards | ${cells.mkString(" | ")} |")
    }
    spark.stop()
  }
}
