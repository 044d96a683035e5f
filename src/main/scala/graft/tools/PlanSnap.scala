package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{SparkEntry, SparkEnv}

/** Dev tool: snapshot `explain("formatted")` for named queries into
  * per-query files — the before/after plan evidence an optimization
  * round commits under `plans/rNN/`.
  *
  *   sbt "runMain graft.tools.PlanSnap plans/r15 before q_foo q_bar"
  *
  * Streaming-backed queries (q_stream_*) are skipped with a note:
  * building their DataFrame RUNS the pipeline and returns a sink
  * scan, so there is no batch plan to snapshot (streaming plan
  * properties are pinned by the streaming specs instead).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <tag> <query>...")
    val (outDir, tag, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val out = Paths.get(outDir, s"${name}_$tag.txt")
      if (name.startsWith("q_stream_")) {
        Files.write(out, ("streaming pipeline: no batch plan to snapshot " +
          "(the declared DataFrame is a post-run sink scan); plan " +
          "properties are pinned by the streaming specs\n")
          .getBytes(StandardCharsets.UTF_8))
      } else {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(out, (s"# $name ($tag) over $sfDir\n\n" + plan)
          .getBytes(StandardCharsets.UTF_8))
      }
      println(s"wrote $out")
    }
    spark.stop()
  }
}
