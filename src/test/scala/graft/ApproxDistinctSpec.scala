package graft

import org.apache.spark.sql.functions._

/** The named gates behind the two HLL rows-only queries: their
  * estimates must agree with the exact COUNT(DISTINCT) within the
  * configured error bound on real fixture data, and the DataSketches
  * union must equal sketching the union directly (the mergeability
  * that justifies the per-(day,type) partial-sketch design).
  */
class ApproxDistinctSpec extends SparkSpec {

  test("q_events_approx_users: HLL daily estimates within rsd bound of exact") {
    import spark.implicits._
    val approx = queries.TimeSeries.eventsApproxUsers.fn(spark, sf)
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val exact = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("bucket"))
      .agg(countDistinct("user_id").as("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, n) =>
      val a = approx(day)
      // rsd 0.02 requested; allow 5 sigma (worst-case days are small,
      // where HLL is near-exact anyway)
      assert(math.abs(a - n).toDouble / n <= 0.10,
        s"$day: approx=$a exact=$n")
    }
  }

  test("q_approx_percentiles: GK estimates honor the rank-error guarantee") {
    import spark.implicits._
    // percentile_approx(accuracy = 1000) guarantees rank error
    // <= n / 1000; verify each reported quantile's TRUE rank lands
    // inside the guaranteed band around q*n on real fixture data
    val approx = queries.Functions.approxPercentiles.fn(spark, sf)
      .select("l_returnflag", "p50", "p90", "p99")
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (flag, p50, p90, p99) =>
      val vals = Tables.lineitem(spark, sf)
        .filter(col("l_returnflag") === flag)
        .select("l_extendedprice").as[Double].collect().sorted
      val n = vals.length
      val tol = n.toDouble / 1000 + 1
      for ((q, v) <- Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99)) {
        // GK guarantees SOME rank of the returned element is within
        // tol of q*n; a duplicated boundary value occupies the rank
        // INTERVAL [count(<v)+1, count(<=v)], so the band must
        // intersect the interval, not its max alone (review finding)
        val lo = vals.count(_ < v) + 1
        val hi = vals.count(_ <= v)
        assert(lo - tol <= q * n && q * n <= hi + tol,
          s"$flag q=$q: value $v ranks [$lo,$hi] of $n (tol $tol)")
      }
    }
  }

  test("q_hll_sketch_users: per-type sketch union equals direct daily sketch") {
    import spark.implicits._
    val viaUnion = queries.Functions2.hllSketch.fn(spark, sf)
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val direct = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .cast("long").as("approx_users"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    // mergeability: unioning per-(day,type) partial sketches must give
    // the same estimate as sketching each day's users in one pass
    assert(viaUnion == direct)
    val exact = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct("user_id").as("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    exact.foreach { case (day, n) =>
      assert(math.abs(viaUnion(day) - n).toDouble / n <= 0.10,
        s"$day: approx=${viaUnion(day)} exact=$n")
    }
  }

  test("KMV set-algebra ESTIMATING regime: past capacity, the " +
      "|A∩B∩minima(U)|/k overlap estimator lands within the rsd band") {
    // q_kmv_audience_overlap's gate covers the exact regime (universe
    // < k, FixtureDriftSpec-pinned); this pins the documented
    // past-capacity path the scaladoc and SCALING claim: with a
    // synthetic universe ≫ k, estimate |A∩B| as
    // (|sketch(A) ∩ sketch(B) ∩ minima_k(A∪B)| / k) · est(|A∪B|).
    // Planted overlap: A = [0, 8000), B = [4000, 12000) → |A∩B| = 4000,
    // |A∪B| = 12000. k = 256 → rsd ≈ 1/√(k−2) ≈ 6.3%; assert 4 rsd.
    import spark.implicits._
    import graft.functions.KmvSketch
    val k = 256
    val a = (0L until 8000L).toDF("u").select(lit("a").as("s"), col("u"))
    val b = (4000L until 12000L).toDF("u").select(lit("b").as("s"), col("u"))
    val st = a.union(b).groupBy("s")
      .agg(KmvSketch.kmv_state(col("u"), k).as("state"),
        KmvSketch.kmv_distinct(col("u"), k).as("est"))
      .as[(String, Array[Long], Long)].collect()
      .map { case (s, st2, e) => s -> (st2, e) }.toMap
    val sa = st("a")._1.toSet
    val sb = st("b")._1.toSet
    // union sketch = k smallest of the merged minima (state arrays are
    // sign-flipped ascending, so plain sort ≡ unsigned order)
    val unionMinima = (st("a")._1 ++ st("b")._1).distinct.sorted.take(k)
    val estUnion = {
      val frac = (unionMinima.last.toDouble - Long.MinValue.toDouble) / math.pow(2, 64)
      math.round((k - 1) / frac)
    }
    val rho = unionMinima.count(h => sa.contains(h) && sb.contains(h)).toDouble / k
    val estOverlap = rho * estUnion
    val rsd = 1.0 / math.sqrt(k - 2)
    assert(math.abs(estUnion - 12000.0) / 12000.0 <= 4 * rsd,
      s"union est $estUnion vs 12000")
    assert(math.abs(estOverlap - 4000.0) / 4000.0 <= 4 * rsd * 2,
      s"overlap est $estOverlap vs 4000 (rsd=$rsd)")
  }
}
