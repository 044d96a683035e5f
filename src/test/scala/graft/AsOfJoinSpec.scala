package graft

import graft.operators.AsOf
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native as-of join (AsOfJoinPlan/AsOfJoinExec): physical shape,
  * equivalence with the union+window form, and the null contract.
  */
class AsOfJoinSpec extends SparkSpec {

  test("native as-of join matches the union+window as-of exactly") {
    val native = SparkEntry.queries("q_asof_native")(spark, sf)
    val legacy = SparkEntry.queries("q_asof_join")(spark, sf)
    assert(native.count() > 0)
    assert(native.exceptAll(legacy).count() == 0)
    assert(legacy.exceptAll(native).count() == 0)
  }

  test("native as-of join plans one exchange + sort per side, no pair blow-up") {
    val p = SparkEntry.queries("q_asof_native")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // exactly the four required exchanges: one per join side, one
    // inside the clicks (user_id, sec) pre-aggregation, one for the
    // final ORDER BY — and in particular no expand-then-aggregate
    // blow-up like Spark's built-in RewriteAsOfJoin would produce
    assert("Exchange".r.findAllIn(p).size == 4, p)
  }

  test("null keys and null times never match; ties resolve to latest row") {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("t", LongType, nullable = true),
      StructField("tag", StringType, nullable = false)))
    def df(rows: Seq[(java.lang.Long, java.lang.Long, String)], prefix: String) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2),
        schema)
        .select(col("k").as(s"${prefix}k"), col("t").as(s"${prefix}t"),
          col("tag").as(s"${prefix}tag"))
    val left = df(Seq(
      (1L, 10L, "l_a"),            // matches r at t=9 (latest <= 10)
      (1L, 3L, "l_early"),         // no right row <= 3
      (2L, 10L, "l_nullside"),     // only right rows for k=2 have null t
      (null, 10L, "l_nullkey"),    // null key: never matches
      (3L, null, "l_nulltime"),    // null time: never matches
      (4L, 10L, "l_d")), "l")      // exact-time tie: t=10 matches
    val right = df(Seq(
      (1L, 5L, "r_old"), (1L, 9L, "r_new"), (1L, 11L, "r_future"),
      (2L, null, "r_nulltime"),
      (null, 1L, "r_nullkey"),
      (4L, 10L, "r_exact")), "r")
    val out = AsOf.join(left, right,
        leftKeys = Seq(left("lk")), rightKeys = Seq(right("rk")),
        leftTime = left("lt"), rightTime = right("rt"))
      .select("ltag", "rtag").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(out == Set(("l_a", "r_new"), ("l_d", "r_exact")), out)
  }
}
