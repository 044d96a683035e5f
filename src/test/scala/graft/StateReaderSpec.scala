package graft

import graft.streaming.StateReader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** State-store introspection (SURVEY.md §2 I13, q_state_reader): the
  * `statestore` batch source over a completed streaming-aggregation
  * checkpoint. Pins the two things the declared query depends on that
  * are Spark-internal rather than part of our own code: the state KEY
  * schema carries the pre-projected grouping column NAMES, and the
  * state VALUE schema is the aggregation buffer (`count` for COUNT,
  * `sum`+`isEmpty` for the DECIMAL SUM). A Spark upgrade that changes
  * either fails here by name instead of reddening the driver gate.
  */
class StateReaderSpec extends SparkSpec {

  test("state key/value schemas carry named grouping columns and the " +
      "count/sum buffer fields") {
    val ckpt = StateReader.dailyCounterCheckpoint(spark, sf)
    val st = spark.read.format("statestore").load(ckpt)
    val key = st.schema("key").dataType.asInstanceOf[StructType]
    assert(key.fieldNames.toSeq == Seq("event_type", "day"),
      s"state key fields drifted: ${key.fieldNames.mkString(",")}")
    val value = st.schema("value").dataType.asInstanceOf[StructType]
    assert(value.fieldNames.toSeq == Seq("count", "sum", "isEmpty"),
      s"agg buffer fields drifted: ${value.fieldNames.mkString(",")}")
  }

  test("decoded state rows reconcile exactly with the batch aggregation " +
      "(stream-batch state unification)") {
    val ckpt = StateReader.dailyCounterCheckpoint(spark, sf)
    val decoded = StateReader.readDailyCounters(spark, ckpt)
    val batch = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    assert(decoded.count() == batch.count())
    assert(decoded.except(batch).isEmpty && batch.except(decoded).isEmpty,
      "state contents != batch aggregation of the same input")
  }

  test("state rows spread across partitions by key hash (the parallel " +
      "read path, not a single-store scan)") {
    val ckpt = StateReader.dailyCounterCheckpoint(spark, sf)
    val nParts = spark.read.format("statestore").load(ckpt)
      .select(countDistinct(col("partition_id"))).head().getLong(0)
    assert(nParts > 1L, s"all state rows in $nParts partition(s) — " +
      "expected hash-spread across the store shards")
  }
}
