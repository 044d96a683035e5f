package graft

import org.apache.spark.sql.functions._

/** Degenerate-group guards for the closed-form moment rewrites
  * (advisor r10): a 1-row group divides by n−1 = 0 and a zero-variance
  * series hands sqrt a 0 (or post-cancellation negative) argument.
  * Spark's Divide and DuckDB's both NULL a 0.0 divisor, but DuckDB
  * ERRORS outright on sqrt(<0) while Spark returns NaN — so both
  * sides now gate on the SAME exact-arithmetic predicate and emit
  * NULL. This spec drives the Spark side over a fixture that actually
  * hits the degenerate branches (the graded sfs never do) and asserts
  * NULL — never NaN/±Inf, which would hash-diverge or crash the
  * oracle.
  */
class DegenerateStatsSpec extends SparkSpec {

  private lazy val degenDir: String = {
    val dir = SparkEnv.scratchDir("degen-sf")
    import spark.implicits._
    // SOLO: one row (n = 1 → sd/var/cv undefined). FLAT: three rows,
    // zero variance in BOTH cents and x (corr undefined). OK: a
    // healthy group that must keep producing real numbers.
    val base = spark.read.parquet(s"$sf/customer.parquet")
    val degen = Seq(
      (90001L, "SOLO", 100.00, 3L),
      (90011L, "FLAT", 250.00, 5L),
      (90012L, "FLAT", 250.00, 5L),
      (90013L, "FLAT", 250.00, 5L),
      (90021L, "OK", 10.00, 1L),
      (90022L, "OK", 20.00, 2L),
      (90023L, "OK", 40.00, 7L)
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal", "c_nationkey")
    val aligned = degen.select(base.schema.fieldNames.map { f =>
      if (degen.columns.contains(f)) col(f).cast(base.schema(f).dataType).as(f)
      else lit(null).cast(base.schema(f).dataType).as(f)
    }: _*)
    aligned.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // events: two types with CONSTANT hourly counts (zero variance on
    // both sides of every pair → r undefined for all pairs)
    val ev = spark.read.parquet(s"$sf/events.parquet").limit(0)
    val rows = (0 until 4).flatMap { h =>
      Seq(("click", h), ("view", h))
    }.toDF("event_type", "h")
      .select(col("event_type"),
        (lit(1704067200L) + col("h") * 3600).cast("timestamp").as("ts"))
    val evAligned = rows.select(ev.schema.fieldNames.map { f =>
      if (rows.columns.contains(f)) col(f).cast(ev.schema(f).dataType).as(f)
      else lit(null).cast(ev.schema(f).dataType).as(f)
    }: _*)
    evAligned.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def assertNoIeeeEscapes(rows: Array[org.apache.spark.sql.Row],
      cols: Seq[Int]): Unit =
    rows.foreach { r =>
      cols.foreach { i =>
        if (!r.isNullAt(i)) {
          val v = r.getDouble(i)
          assert(!v.isNaN && !v.isInfinite, s"row $r col $i leaked $v")
        }
      }
    }

  test("q_stats_funcs: 1-row and zero-variance groups emit NULL, healthy groups real values") {
    val out = SparkEntry.queries("q_stats_funcs")(spark, degenDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val solo = out("SOLO")
    assert(solo.isNullAt(1) && solo.isNullAt(2) && solo.isNullAt(3) && solo.isNullAt(4),
      s"SOLO (n=1) must NULL all four stats: $solo")
    val flat = out("FLAT")
    // n>1 → sd/var/cv defined (all zero/flat covariance), but corr's
    // zero-variance denominator gates r to NULL
    assert(flat.getDouble(1) == 0.0 && flat.getDouble(2) == 0.0)
    assert(flat.isNullAt(4), s"FLAT zero-variance corr must be NULL: $flat")
    val ok = out("OK")
    assert(!ok.isNullAt(1) && !ok.isNullAt(4), s"OK group lost real stats: $ok")
    assertNoIeeeEscapes(out.values.toArray, Seq(1, 2, 3, 4))
  }

  test("q_type_correlation: zero-variance series pairs emit NULL r, never NaN") {
    val rows = SparkEntry.queries("q_type_correlation")(spark, degenDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.isNullAt(2), s"constant series must NULL r: $r"))
    assertNoIeeeEscapes(rows, Seq(2))
  }
}
