package graft.tools
import graft.{SparkEntry, SparkEnv}
object WinnowPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_winnow_fingerprints", "q_passage_overlap")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val opt = df.queryExecution.optimizedPlan.toString
      val phys = df.queryExecution.executedPlan.toString
      println(s"== $q optimized winnow_fps count: " + "winnow_fps".r.findAllIn(opt).size)
      println(s"== $q physical  winnow_fps count: " + "winnow_fps".r.findAllIn(phys).size)
      println(opt.linesIterator.filter(_.contains("winnow_fps")).mkString("\n"))
    }
    spark.stop()
  }
}
