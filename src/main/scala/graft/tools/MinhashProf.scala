package graft.tools
import graft.{SparkEnv, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev-only stage split of the portable vs production minhash-LSH
  * pipelines at sf0.1.
  */
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.warmCpu(spark)
    val docs = Tables.documents(spark, sfDir)
    def time(label: String)(f: => Any): Unit = (1 to 3).foreach { p =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-40s pass$p ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    time("sig only: xxhash whole-sig k=32")(
      docs.filter(col("text").isNotNull)
        .selectExpr("doc_id", "minhash_sig(text, 3, 32) AS sig")
        .queryExecution.toRdd.count())
    time("sig only: md5 CW k=16")(
      docs.filter(col("text").isNotNull)
        .selectExpr("doc_id", "minhash_sig_md5(text, 3, 16) AS sig")
        .queryExecution.toRdd.count())
    time("candidates: production")(
      Dedup.minhashCandidates(docs).queryExecution.toRdd.count())
    time("candidates: portable")(
      Dedup.minhashCandidatesPortable(docs).queryExecution.toRdd.count())
    time("full production pipeline")(
      Dedup.minhashNearDups(docs).queryExecution.toRdd.count())
    time("full portable (declared)")(
      graft.SparkEntry.queries("q_minhash_near_dups")(spark, sfDir)
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
