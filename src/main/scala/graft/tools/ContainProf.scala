package graft.tools

import graft.{SparkEnv, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: A/B/C the containment-pairs pipeline's gram-relation
  * reuse strategy at sf0.1 (the q_passage_overlap "profile before
  * optimizing" discipline applied to q_containment_pairs):
  *
  *   A. recompute — the shipped shape: the distinct-gram subtree
  *      (scan + token_ngrams + distinct) evaluates twice, once under
  *      the per-doc count aggregate and once under the buckets.
  *   B. persist — cache the distinct-gram relation, read it twice.
  *   C. single-pass — collect ALL grams' id-lists once; derive the
  *      per-doc counts by re-exploding the lists (extra exchanges
  *      over the distinct-gram stream, but the corpus is scanned and
  *      shingled exactly once).
  */
object ContainProf {
  private val L = 5
  private val maxDf = 64

  private def occOf(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull && size(split(col("text"), " ", -1)) >= L)
      .select(col("doc_id"), expr(s"token_ngrams(text, $L)"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("gh"))
      .distinct()

  private def pairsFrom(buckets: DataFrame): DataFrame =
    buckets.select(expr("ordered_pairs(ids)"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"), min("lnf").as("lnf"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("lnf").cast("long").as("lnf"),
        round(col("n_shared") / col("lnf").cast("double"), 6).as("containment"))

  def variantA(docs: DataFrame): DataFrame = {
    val occ = occOf(docs)
    val cnt = occ.groupBy("doc_id").agg(count(lit(1)).cast("int").as("n"))
    val buckets = occ.join(cnt, "doc_id")
      .groupBy("gh")
      .agg(collect_list(struct(col("doc_id").as("id"), col("n").as("n"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDf)
    pairsFrom(buckets)
  }

  def variantB(docs: DataFrame): DataFrame = {
    val occ = occOf(docs).persist()
    val cnt = occ.groupBy("doc_id").agg(count(lit(1)).cast("int").as("n"))
    val buckets = occ.join(cnt, "doc_id")
      .groupBy("gh")
      .agg(collect_list(struct(col("doc_id").as("id"), col("n").as("n"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDf)
    pairsFrom(buckets)
  }

  def variantC(docs: DataFrame): DataFrame = {
    val dfAll = occOf(docs).groupBy("gh")
      .agg(collect_list(col("doc_id")).as("docs"))
    val cnt = dfAll.select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("n"))
    val buckets = dfAll
      .filter(size(col("docs")) >= 2 && size(col("docs")) <= maxDf)
      .select(col("gh"), explode(col("docs")).as("doc_id"))
      .join(cnt, "doc_id")
      .groupBy("gh")
      .agg(collect_list(struct(col("doc_id").as("id"), col("n").as("n"))).as("ids"))
    pairsFrom(buckets)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark: SparkSession = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { spark.range(1000).selectExpr("sum(id)").count(); graft.Bench.warmCpu(spark) }
    catch { case _: Throwable => }
    val variants = Seq[(String, DataFrame => DataFrame)](
      "A-recompute" -> variantA, "B-persist" -> variantB, "C-singlepass" -> variantC)
    for (p <- 1 to 3; (name, v) <- variants) {
      spark.catalog.clearCache()
      val docs = Tables.documents(spark, sfDir)
      val t0 = System.nanoTime()
      val n = v(docs).queryExecution.toRdd.count()
      println(f"[contain] pass $p $name%-14s rows=$n%5d t=${(System.nanoTime() - t0) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
