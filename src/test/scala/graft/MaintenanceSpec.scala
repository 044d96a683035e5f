package graft

import org.apache.spark.sql.functions._
import graft.queries.Maintenance

/** Operator laws for the table-maintenance family, beyond the oracle
  * gates: upsert's MERGE semantics on a hand-built delta, SCD2's
  * interval algebra (contiguity + genuine change points), and the
  * recursive spine's conservation of the fact-table totals.
  */
class MaintenanceSpec extends SparkSpec {

  test("upsert: updates win, inserts append, untouched rows survive") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B2"), (9L, "new")).toDF("k", "v")
    val out = Maintenance.upsert(base, updates, "k")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
  }

  test("upsert result keys are unique even when delta repeats base keys") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((1L, "A"), (2L, "B")).toDF("k", "v")
    val out = Maintenance.upsert(base, updates, "k")
    assert(out.count() == out.select("k").distinct().count())
  }

  test("scd2 intervals are contiguous per user and segments truly change") {
    val rows = Maintenance.qScd2History.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, r.getDate(3).toString))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, segs0) =>
      val segs = segs0.sortBy(_._3)
      segs.foreach { case (_, _, from, to) => assert(from < to) }
      segs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, "valid_to must meet the next valid_from")
          assert(a._2 != b._2, "consecutive segments must change type")
        case _ =>
      }
      assert(segs.last._4 == "2024-12-31") // open segment sentinel
    }
  }

  test("upsert laws: idempotent, and sequential deltas compose last-writer-wins") {
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String)].collect().sortBy(_._1).toSeq
    val base = (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
    val u1 = Seq((3L, "u1-3"), (4L, "u1-4"), (30L, "u1-30")).toDF("k", "v")
    val u2 = Seq((4L, "u2-4"), (31L, "u2-31")).toDF("k", "v")
    val once = Maintenance.upsert(base, u1, "k")
    // idempotent: the same delta applied twice changes nothing
    assert(canon(Maintenance.upsert(once, u1, "k")) == canon(once))
    // associativity: (base ⊕ u1) ⊕ u2 == base ⊕ (u1 ⊕ u2) — deltas
    // can be pre-merged offline and applied in one pass
    assert(canon(Maintenance.upsert(once, u2, "k")) ==
      canon(Maintenance.upsert(base, Maintenance.upsert(u1, u2, "k"), "k")))
  }

  test("dq audit detectors fire on planted violations") {
    import spark.implicits._
    // orders: key 1 duplicated (3 copies -> 2 extra), order 5 has a
    // custkey with no customer, order 6 a NULL custkey
    val orders = Seq(
      (1L, java.lang.Long.valueOf(10L)), (1L, java.lang.Long.valueOf(10L)),
      (1L, java.lang.Long.valueOf(10L)), (2L, java.lang.Long.valueOf(11L)),
      (5L, java.lang.Long.valueOf(999L)), (6L, null.asInstanceOf[java.lang.Long]))
      .toDF("o_orderkey", "o_custkey")
    // lineitem: orderkey 77 has no order; one non-positive price
    val lineitem = Seq((1L, 5.0), (77L, 6.0), (2L, -1.0))
      .toDF("l_orderkey", "l_extendedprice")
    val customer = Seq(10L, 11L).toDF("c_custkey")
    val got = queries.Maintenance.dqAudit(orders, lineitem, customer)
      .as[(String, Long)].collect().toMap
    assert(got("dup_order_keys") == 2)
    assert(got("lineitem_orphans") == 1)
    assert(got("null_custkeys") == 1)
    assert(got("nonpositive_price") == 1)
    // NULL custkey never equi-joins, so order 6 counts as an orphan
    // too - the audit reports it under BOTH its checks, deliberately
    assert(got("order_orphans") == 2)
  }

  test("snapshot diff id-shift invariant holds on the fixtures") {
    // v2's +100000 shift assumes shifted ids can't collide with real
    // ones, and doc_id % (101*103) == 0 would make a shifted row
    // changed-eligible; both engines would compute the same WRONG
    // classification (gate stays green), so pin the precondition here
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val maxId = Tables.documents(spark, d)
        .agg(max("doc_id")).head.getLong(0)
      assert(maxId < 101L * 103L, s"doc_id range grew to $maxId in $d — " +
        "revisit q_snapshot_diff's shift constant and modulus choices")
    }
  }

  test("snapshot diff fires all four change categories (never vacuous)") {
    val byType = Maintenance.qSnapshotDiff.fn(spark, sf)
      .groupBy("change_type").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("added", "removed", "changed", "unchanged").foreach { t =>
      assert(byType.getOrElse(t, 0L) > 0, s"category '$t' is empty: $byType")
    }
  }

  test("scd2 and snapshot diff are invariant under input repartitioning") {
    // full deterministic tie-breaks mean the declared results cannot
    // depend on physical layout — the property that makes the gates
    // replayable on any cluster shape
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    for (name <- Seq("q_scd2_history", "q_snapshot_diff")) {
      val base = canon(SparkEntry.queries(name)(spark, sf))
      val parts = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert(canon(SparkEntry.queries(name)(spark, sf)) == base,
          s"$name changed under a different partition count")
      } finally spark.conf.set("spark.sql.shuffle.partitions", parts)
    }
  }

  test("recursive spine conserves order totals and covers 84 months") {
    val out = Maintenance.qRecursiveCte.fn(spark, sf)
    assert(out.count() == 84)
    val spineTotal = out.agg(sum("n_orders")).head.getLong(0)
    assert(spineTotal == Tables.orders(spark, sf).count())
  }
}
