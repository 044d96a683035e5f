package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.{Encoders, SparkSession}

/** Spark 4 transformWithState (SURVEY.md §2 I6, the successor API to
  * flatMapGroupsWithState): per-user running counter with typed
  * ValueState on the RocksDB state store provider.
  */
class TransformWithStateSpec extends SparkSpec {

  test("transformWithState keeps per-key running counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDS().groupByKey(_._1)
        .transformWithState(new graft.streaming.Windows.RunningCountProcessor[Long],
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n")
        .writeStream.format("memory").queryName("tws_t")
        .outputMode("update").start()
      mem.addData(Seq((1L, 1L), (1L, 2L), (2L, 1L)))
      q.processAllAvailable()
      mem.addData(Seq((1L, 3L), (2L, 2L), (3L, 1L)))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_t").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      assert(rows == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
