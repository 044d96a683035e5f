package graft

import org.apache.spark.sql.functions._

/** Hand-computed semantics for the cohort/lifecycle reports
  * (queries/Cohorts.scala) on planted mini-corpora — the oracle gate
  * proves engine parity at sf scale; these pin the *intended* business
  * semantics on inputs small enough to verify by hand.
  */
class CohortSpec extends SparkSpec {
  import SparkSpec.spark

  /** Plant an events.parquet with the fixture schema under a scratch
    * dir (queries read through Tables.events, so the dir is the API).
    */
  private def plant(name: String,
      rows: Seq[(Long, String, Long, String, Double)]): String = {
    val d = SparkEnv.scratchDir(name)
    import spark.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("cohort retention triangle matches the hand-computed matrix") {
    // u1: first Jan 1, active 1/2/3; u2: first Jan 1, active 1 and 3;
    // u3: first Jan 2 only. Cohort Jan1 size 2, cohort Jan2 size 1.
    val d = plant("cohort-retention", Seq(
      (1L, "2024-01-01 08:00:00", 1L, "view", 0.0),
      (2L, "2024-01-02 08:00:00", 1L, "view", 0.0),
      (3L, "2024-01-03 08:00:00", 1L, "view", 0.0),
      (4L, "2024-01-01 09:00:00", 2L, "view", 0.0),
      (5L, "2024-01-03 09:00:00", 2L, "view", 0.0),
      (6L, "2024-01-02 10:00:00", 3L, "view", 0.0)))
    val got = SparkEntry.queries("q_cohort_retention")(spark, d)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val want = Set(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-01", 2, 2L, 2L, 1.0),
      ("2024-01-02", 0, 1L, 1L, 1.0))
    assert(got == want, s"got $got")
  }

  test("transition matrix is deterministic under equal timestamps") {
    // u1's three events share ONE timestamp — order must come from the
    // event_id tiebreak (click→view→purchase), not partition luck.
    val d = plant("cohort-transitions", Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (3L, "2024-01-01 00:00:00", 1L, "purchase", 5.0),
      (4L, "2024-01-02 00:00:00", 2L, "view", 0.0),
      (5L, "2024-01-02 00:01:00", 2L, "view", 0.0)))
    val got = SparkEntry.queries("q_event_transitions")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val want = Set(
      ("click", "view", 1L, 1.0),
      ("view", "purchase", 1L, 0.5),
      ("view", "view", 1L, 0.5))
    assert(got == want, s"got $got")
  }

  test("rfm buckets follow the exact percentile cutpoints") {
    // Four users laid out so every metric has a distinct quartile:
    // recency 3/2/1/0, freq 4/3/2/1, cents 1000/2000/3000/0.
    val d = plant("cohort-rfm", Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 10.0),
      (2L, "2024-01-01 01:00:00", 1L, "view", 0.0),
      (3L, "2024-01-01 02:00:00", 1L, "view", 0.0),
      (4L, "2024-01-01 03:00:00", 1L, "view", 0.0),
      (5L, "2024-01-02 00:00:00", 2L, "purchase", 20.0),
      (6L, "2024-01-02 01:00:00", 2L, "view", 0.0),
      (7L, "2024-01-02 02:00:00", 2L, "view", 0.0),
      (8L, "2024-01-03 00:00:00", 3L, "purchase", 30.0),
      (9L, "2024-01-03 01:00:00", 3L, "view", 0.0),
      (10L, "2024-01-04 00:00:00", 4L, "view", 0.0)))
    val got = SparkEntry.queries("q_user_rfm")(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getDouble(4))).toSet
    val want = Set(
      (4, 4, 2, 1L, 10.0), // u1: stale but busy, mid spend
      (3, 3, 3, 1L, 20.0), // u2
      (2, 2, 4, 1L, 30.0), // u3: freshest spender
      (1, 1, 1, 1L, 0.0))  // u4: new, single visit, no spend
    assert(got == want, s"got $got")
  }

  test("rfm segments are invariant under input repartitioning") {
    val base = SparkEntry.queries("q_user_rfm")(spark, sf)
      .collect().map(_.toSeq).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val odd = SparkEntry.queries("q_user_rfm")(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(odd == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
