package graft.queries

import graft.DeclaredQuery
import graft.streaming.{InMemoryServingStore, Serving}
import org.apache.spark.sql.functions._

/** Streaming pipeline pushed through the judged batch gate
  * (SURVEY.md §2.I oracle strategy): run the ACTUAL Structured
  * Streaming job (file source → watermarked hourly agg → foreachBatch
  * KV upsert) to completion with Trigger.AvailableNow, then return the
  * serving-store contents as a DataFrame. The oracle recomputes the
  * same counters in SQL — stream-batch unification, checked by hash.
  */
object StreamingQueries {

  val streamHourly = DeclaredQuery(
    "q_stream_hourly_counters",
    """SELECT event_type || '/hour/' || strftime(date_trunc('hour', ts), '%Y-%m-%d-%H') AS key,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val checkpoint = graft.SparkEnv.scratchDir("graft-stream-ckpt")
    val store = Serving.runPipeline(s, d, new InMemoryServingStore, checkpoint)
    store.snapshot().toDF()
      .select(col("key"), col("nEvents").as("n_events"),
        col("sumValue").as("sum_value"))
      .orderBy("key")
  }

  /** The reference's signature eager time-cube — all four calendar
    * granularities maintained at once — via the single-state exploded
    * streaming aggregation (Serving.multiGranularityCounters). The
    * oracle recomputes every granularity's counters in one UNION ALL.
    */
  val streamMultiGran = DeclaredQuery(
    "q_stream_multigran_counters",
    Seq("hour" -> "%Y-%m-%d-%H", "day" -> "%Y-%m-%d",
      "month" -> "%Y-%m", "year" -> "%Y").map { case (g, f) =>
      s"""SELECT event_type || '/$g/' || strftime(date_trunc('$g', ts), '$f') AS key,
         |       count(*) AS n_events,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY key")) { (s, d) =>
    import s.implicits._
    val checkpoint = graft.SparkEnv.scratchDir("graft-stream-cube-ckpt")
    val store = Serving.runMultiGranularityCube(
      s, d, new InMemoryServingStore, checkpoint)
    store.snapshot().toDF()
      .select(col("key"), col("nEvents").as("n_events"),
        col("sumValue").as("sum_value"))
      .orderBy("key")
  }

  val all: Seq[DeclaredQuery] = Seq(streamHourly, streamMultiGran)
}
