package graft.tools
import org.apache.spark.sql.functions._
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val approx = graft.operators.Hnsw.annHnswTopK(spark, d)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val t1 = (System.nanoTime() - t0) / 1e9
      val exact = graft.SparkEntry.queries("q_cosine_topk")(spark, d)
        .select(col("q_id").cast("long"), col("vec_id").cast("long")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rec = exact.map { case (q, ex) =>
        approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
      println(f"[hnsw] $d recall@3=${rec.sum / rec.size}%.3f probeTime=$t1%.2f s")
      // determinism: rebuild fresh and compare adjacency
      val g1 = graft.operators.Hnsw.buildShardGraphs(graft.Tables.embeddings(spark, d))
        .orderBy("shard", "vec_id").collect().map(_.toString)
      val g2 = graft.operators.Hnsw.buildShardGraphs(
        graft.Tables.embeddings(spark, d).repartition(13))
        .orderBy("shard", "vec_id").collect().map(_.toString)
      println(s"[hnsw] $d deterministic=${g1.sameElements(g2)} nodes=${g1.length}")
    }
    spark.stop()
  }
}
