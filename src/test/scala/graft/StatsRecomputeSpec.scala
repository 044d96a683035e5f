package graft

import org.apache.spark.sql.functions._

/** Independent plain-Scala recomputes for the round-9 statistics
  * batches (Analytics4/5 + the incremental rollup). The DuckDB oracles
  * for these queries replay the same algebra, so a gate failure there
  * catches engine divergence but not a shared formula mistake; these
  * tests recompute each statistic from first principles on the
  * collected sf0.001 rows (different code path, different operation
  * order) and hold the declared results to it.
  *
  * Exact-integer statistics (KS numerator, counts, the rollup's
  * decimal sums) are compared exactly; float statistics computed in a
  * DIFFERENT operation order are compared to 1e-5 — tighter than any
  * real formula error, looser than reordering ulps.
  */
class StatsRecomputeSpec extends SparkSpec {

  private val eps = 1e-5

  /** linear-interpolated quantile at fraction p over a sorted array —
    * the (n−1)p convention both engines implement */
  private def quantile(sorted: Array[Double], p: Double): Double = {
    val pos = (sorted.length - 1) * p
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 >= sorted.length) sorted(lo)
    else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * frac
  }

  test("q_mad equals a plain-Scala median-absolute-deviation") {
    val rows = Tables.documents(spark, sf).select("lang", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
    val byLang = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val declared = SparkEntry.queries("q_mad")(spark, sf).collect()
    assert(declared.length === byLang.size)
    declared.foreach { r =>
      val xs = byLang(r.getString(0))
      val med = quantile(xs, 0.5)
      val mad = quantile(xs.map(x => math.abs(x - med)).sorted, 0.5)
      assert(r.getLong(1) === xs.length.toLong)
      assert(math.abs(r.getDouble(2) - med) < eps, s"median ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - mad) < eps, s"mad ${r.getString(0)}")
    }
  }

  test("q_iqr_outliers equals a plain-Scala Tukey fence count") {
    val rows = Tables.events(spark, sf).select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = rows.groupBy(identity).view.mapValues(_.length.toDouble)
    val byType = counts.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2).toArray.sorted).toMap
    val declared = SparkEntry.queries("q_iqr_outliers")(spark, sf).collect()
    declared.foreach { r =>
      val xs = byType(r.getString(0))
      val (q1, q3) = (quantile(xs, 0.25), quantile(xs, 0.75))
      val outliers = xs.count(_ > q3 + 1.5 * (q3 - q1))
      assert(r.getLong(1) === xs.length.toLong, "n_users")
      assert(math.abs(r.getDouble(2) - (q3 - q1)) < eps, "iqr")
      assert(r.getLong(3) === outliers.toLong, s"outliers ${r.getString(0)}")
    }
  }

  test("q_welch_ttest equals a direct two-sample Welch computation") {
    val rows = Tables.events(spark, sf).select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val declared = SparkEntry.queries("q_welch_ttest")(spark, sf).collect()
    declared.foreach { r =>
      val t = r.getString(0)
      val g = rows.filter(_._1 == t).map(_._2)
      val rest = rows.filter(_._1 != t).map(_._2)
      def mean(a: Array[Double]) = a.sum / a.length
      def varU(a: Array[Double]) = {
        val m = mean(a); a.map(x => (x - m) * (x - m)).sum / (a.length - 1)
      }
      val (m1, m2, v1, v2) = (mean(g), mean(rest), varU(g), varU(rest))
      val (c1, c2) = (v1 / g.length, v2 / rest.length)
      val tStat = (m1 - m2) / math.sqrt(c1 + c2)
      val dof = (c1 + c2) * (c1 + c2) /
        (c1 * c1 / (g.length - 1) + c2 * c2 / (rest.length - 1))
      assert(r.getLong(1) === g.length.toLong)
      assert(r.getLong(2) === rest.length.toLong)
      assert(math.abs(r.getDouble(3) - (m1 - m2)) < eps, s"mean_diff $t")
      assert(math.abs(r.getDouble(4) - tStat) < 1e-4, s"t $t")
      assert(math.abs(r.getDouble(5) - dof) < dof * 1e-5, s"dof $t")
    }
  }

  test("q_ks_test equals an exact integer KS recompute") {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value")
      .collect().map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val clicks = rows.filter(_._1 == "click").map(_._2)
    val views = rows.filter(_._1 == "view").map(_._2)
    val (na, nb) = (clicks.length.toLong, views.length.toLong)
    val values = (clicks ++ views).distinct.sorted
    var (ca, cb, dNum) = (0L, 0L, 0L)
    values.foreach { v =>
      ca += clicks.count(_ == v); cb += views.count(_ == v)
      dNum = math.max(dNum, math.abs(ca * nb - cb * na))
    }
    val r = SparkEntry.queries("q_ks_test")(spark, sf).head()
    assert(r.getLong(0) === na)
    assert(r.getLong(1) === nb)
    assert(r.getLong(2) === dNum) // exact — the argmax ran in integers
    assert(math.abs(r.getDouble(3) - dNum.toDouble / (na * nb)) < eps)
  }

  test("q_autocorrelation equals a textbook ACF on the daily series") {
    val daily = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_shipdate").cast("date").as("day"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("x"))
      .orderBy("l_returnflag", "day")
      .collect().map(r => (r.getString(0), r.getDecimal(2).doubleValue()))
    val byFlag = daily.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val declared = SparkEntry.queries("q_autocorrelation")(spark, sf).collect()
    declared.foreach { r =>
      val xs = byFlag(r.getString(0))
      val n = xs.length
      val m = xs.sum / n
      val denom = xs.map(x => (x - m) * (x - m)).sum
      assert(r.getLong(1) === n.toLong)
      (1 to 7).foreach { k =>
        val num = (k until n).map(t => (xs(t) - m) * (xs(t - k) - m)).sum
        assert(math.abs(r.getDouble(1 + k) - num / denom) < 1e-4,
          s"flag ${r.getString(0)} lag $k")
      }
    }
  }

  test("q_pmi equals a direct bigram PMI recompute (top-25 set + values)") {
    val texts = Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0).split(" ", -1).toSeq)
    val bigrams = texts.flatMap(ws => ws.zip(ws.drop(1)))
    val cxy = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cx = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cy = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = bigrams.length.toLong
    // ranking key = the exact rational cxy·nn/(cx·cy) as ONE IEEE
    // division of exactly-representable long products (the round-10
    // fix: ln is monotone, so the set/order match, but the rational is
    // bit-identical across engines where round(ln(·),9) was not)
    val scored = cxy.filter(_._2 >= 5).toSeq.map { case ((a, b), c) =>
      val r = (c * nn).toDouble / (cx(a) * cy(b)).toDouble
      val pmi = BigDecimal(math.log(r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (a, b, c, pmi, r)
    }
    val ranked = scored.sortBy { case (a, b, _, _, r) => (-r, a, b) }
    val expected = ranked.take(25).map(t => (t._1, t._2, t._3, t._4))
    // cut-boundary gap: rank-25 vs rank-26 keys must either be far
    // apart (> 2 ulp — no engine's arithmetic can reorder them) or
    // EXACTLY equal (then the w1,w2 tie-break is engine-independent)
    if (ranked.length > 25) {
      val k25 = ranked(24)._5
      val k26 = ranked(25)._5
      val gap = k25 - k26
      assert(gap == 0.0 || gap > 2 * math.ulp(k25),
        s"rank-25/26 keys too close to be stable: $k25 vs $k26")
    }
    // resolve columns by name — the declared projection order is not
    // part of the contract the driver checks (it sorts by name)
    val df = SparkEntry.queries("q_pmi")(spark, sf)
    val idx = df.columns.zipWithIndex.toMap
    val decl = df.collect().map(r => (
      r.getString(idx("w1")), r.getString(idx("w2")),
      // pmi is a DOUBLE since round 11 (DECIMAL finals are hash-hostile
      // to the driver — OutputTypeLintSpec)
      r.getLong(idx("cxy")), BigDecimal(r.getDouble(idx("pmi")))))
    assert(decl.map(t => (t._1, t._2, t._3)).toSeq ===
      expected.map(t => (t._1, t._2, t._3)).toSeq)
    decl.zip(expected).foreach { case (d, e) =>
      assert((d._4 - e._4).abs <= BigDecimal("0.000002"), s"${d._1} ${d._2}")
    }
  }

  test("q_psi_drift equals a direct PSI recompute") {
    val rows = Tables.events(spark, sf).select("ts", "value")
      .collect().map { r =>
        val day = r.getTimestamp(0).toLocalDateTime.toLocalDate
        val cents = BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100
        (day, cents.toLongExact / 2800L)
      }
    val cutoff = java.time.LocalDate.parse("2024-01-08")
    val bins = rows.map(_._2).distinct
    val nb = bins.length.toLong
    val baseRows = rows.filter(_._1.isBefore(cutoff))
    val baseC = baseRows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nBase = baseRows.length.toLong
    val declared = SparkEntry.queries("q_psi_drift")(spark, sf).collect()
    assert(declared.nonEmpty)
    declared.foreach { r =>
      val day = r.getDate(0).toLocalDate
      assert(!day.isBefore(cutoff))
      val dayRows = rows.filter(_._1 == day)
      val dayC = dayRows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val nd = dayRows.length.toLong
      val psi = bins.map { bin =>
        val (c, cb) = (dayC.getOrElse(bin, 0L), baseC.getOrElse(bin, 0L))
        val p = (c + 1).toDouble / (nd + nb)
        val q = (cb + 1).toDouble / (nBase + nb)
        (p - q) * math.log(p / q)
      }.sum
      assert(math.abs(r.getDouble(1) - psi) < 1e-5, s"day $day")
      assert(psi >= 0.0) // PSI is a (smoothed) divergence
    }
  }

  test("round-9 statistics queries are bit-identical across parallelism") {
    // the exactness discipline's contract: order-free exact aggregates
    // mean the SAME bytes at any partitioning. Run each new query under
    // two different shuffle-partition settings and require identical
    // collected results (doubles compared bit-for-bit via toString) —
    // a raw-double sum would fail this nondeterministically.
    val names = Seq("q_mad", "q_iqr_outliers", "q_welch_ttest",
      "q_interpolate", "q_autocorrelation", "q_ks_test", "q_pmi",
      "q_psi_drift", "q_incremental_rollup", "q_bfs_hops",
      // round-10 exact-moment rewrites (LnBoundaryMarginSpec finding):
      // built-in stddev/corr/covar and raw double sums were
      // merge-order-dependent; these must now be order-free
      "q_stats_funcs", "q_type_correlation", "q_math_funcs")
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    def snapshot(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    try {
      names.foreach { n =>
        conf.set("spark.sql.shuffle.partitions", "3")
        val a = snapshot(n)
        conf.set("spark.sql.shuffle.partitions", "7")
        val b = snapshot(n)
        assert(a === b, s"$n differs across parallelism")
      }
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("q_incremental_rollup equals the full weekly recompute (exact)") {
    val full = SparkEntry.queries("q_incremental_rollup")(spark, sf).collect()
      .map(r => ((r.getDate(0).toString, r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val recompute = Tables.events(spark, sf)
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
      .collect()
      .map(r => ((r.getDate(0).toString, r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(full === recompute) // incremental ≡ batch, to the last bit
  }
}
