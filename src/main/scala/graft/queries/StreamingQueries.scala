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

  val all: Seq[DeclaredQuery] = Seq(streamHourly)
}
