package graft.tools
import graft.{SparkEnv, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
object ProfLang {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.warmCpu(spark)
    val d = "/root/testdata/sf0.1"
    for (p <- 1 to 2) {
      spark.catalog.clearCache()
      val docs = Tables.documents(spark, d)
      t("gen-only")(docs.select(expr("char_ngrams(text, 3) AS trigram")).count())
      val tri = TextAnalysis.docTrigrams(docs)
      t("docTrigrams.distinct")(tri.count())
      val prof = t("langProfiles+collect")(TextAnalysis.langProfiles(tri).collect())
      println(s"profile rows: ${prof.length}")
      val profDf = TextAnalysis.langProfiles(tri)
      t("score-scan")(TextAnalysis.languageIdBroadcast(docs, profDf).count())
      t("full-query")(graft.SparkEntry.queries("q_language_id")(spark, d).count())
    }
    spark.stop()
  }
}
