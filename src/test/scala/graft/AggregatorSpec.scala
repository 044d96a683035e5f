package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable-aggregate laws (SURVEY.md §5.2 property 4): partial/final
  * decomposition must commute — agg(a ++ b) == merge(agg(a), agg(b)) —
  * or distributed partial aggregation silently corrupts results.
  * Properties are checked over seeded random samples (scalacheck's
  * scalatest bridge is not in the offline dependency cache).
  */
class AggregatorSpec extends AnyFunSuite {

  private val agg = new TopKAggregator(3)
  private val rnd = new scala.util.Random(42)

  private def randomList(): List[Double] =
    List.fill(rnd.nextInt(20))(rnd.nextDouble() * 200 - 100)

  test("top-k merge law: reduce(a++b) == merge(reduce(a), reduce(b))") {
    (1 to 500).foreach { _ =>
      val (a, b) = (randomList(), randomList())
      val direct = (a ++ b).foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(direct.toSeq == merged.toSeq, s"a=$a b=$b")
    }
  }

  test("top-k is order-insensitive") {
    (1 to 500).foreach { _ =>
      val a = randomList()
      val x = a.foldLeft(agg.zero)(agg.reduce)
      val y = rnd.shuffle(a).foldLeft(agg.zero)(agg.reduce)
      assert(x.toSeq == y.toSeq, s"a=$a")
    }
  }

  test("top-k skips NaN and NULL rows like a SQL aggregate") {
    // NaN would otherwise park at the buffer tail (total order) and
    // freeze a full buffer against all future insertions
    val withNaN = List(Double.NaN, 5.0, 9.0, 7.0).foldLeft(agg.zero)(agg.reduce)
    assert(withNaN.toSeq == Seq(9.0, 7.0, 5.0), withNaN.toSeq)
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq(Some(3.0), None, Some(8.0), None, Some(1.0)).toDF("v")
    val got = df.agg(TopKAggregator.top_k(col("v"), 2)).as[Seq[Double]]
      .collect().head
    assert(got == Seq(8.0, 3.0), got)
  }

  test("kmv_distinct does not count NULL rows") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import graft.functions.KmvSketch
    val df = Seq(Some("a"), None, Some("b"), Some("a"), None).toDF("v")
    val n = df.agg(KmvSketch.kmv_distinct(col("v"), 64)).as[Long].collect().head
    assert(n == 2L, s"expected 2 distinct non-null values, got $n")
  }

  test("kmv_kth state is partition-invariant (merge law) and exact below k") {
    // q_kmv_distinct_users' gate leans on the (cnt, kth) STATE being
    // identical whatever partial-merge tree produced it — assert the
    // same hashes through 1, 3, and 7 partitions yield byte-equal
    // state, and that below capacity cnt == exact distinct count.
    import graft.functions.KmvKthAggregator
    val hashes = (1 to 500).map(i => (i.toLong * 2654435761L) & ((1L << 60) - 1))
    val agg = new KmvKthAggregator(64)
    def run(parts: Int) = {
      val bufs = hashes.zipWithIndex.groupBy(_._2 % parts).values
        .map(_.map(_._1).foldLeft(agg.zero)((b, h) => agg.reduce(b, h)))
      agg.finish(bufs.reduce(agg.merge))
    }
    val single = run(1)
    assert(run(3) == single && run(7) == single,
      s"merge law broken: ${run(3)} / ${run(7)} vs $single")
    assert(single.cnt == 64L || hashes.distinct.size < 64)
    val small = new KmvKthAggregator(1024)
    val below = hashes.foldLeft(small.zero)((b, h) => small.reduce(b, h))
    assert(small.finish(below).cnt == hashes.distinct.size.toLong,
      "below capacity the state must hold every distinct hash")
    assert(small.finish(below).kth == -1L, "kth sentinel below capacity")
  }

  test("builtin GK percentile_approx is EXACT nearest-rank at the regime " +
      "boundary accuracy = 2n+1 (eps*n < 0.5 pins BOTH merge and query)") {
    // q_approx_percentiles uses accuracy = 1e7 with huge headroom; this
    // pins the CLAIM at its tightest point. Two constraints must hold
    // and eps*n < 0.5 (accuracy > 2n) is the binding one:
    //  - merge: floor(2*eps*n) < 2 keeps every g=1 sample (needs only
    //    accuracy > n), and
    //  - query: GK answers any sample within targetError = eps*n of
    //    the requested rank — measured here: at accuracy = n+1
    //    (targetError ~ 1) it returns the sample ONE RANK BELOW
    //    nearest-rank, so retaining all samples alone is NOT enough.
    // At accuracy = 2n+1, targetError < 0.5 forces the exact rank, and
    // query(q) must equal sorted[ceil(q*n)] (1-based) for every group
    // and quantile. (FixtureDriftSpec's n < 5e6 pin == this bound at
    // the shipped accuracy = 1e7.)
    val spark = SparkSpec.spark
    import spark.implicits._
    val li = Tables.lineitem(spark, SparkSpec.sf)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    val maxN = li.groupBy("g").count().agg(max("count")).as[Long].head()
    val qs = Seq(0.5, 0.9, 0.99)
    val approx = li.groupBy("g")
      .agg(percentile_approx(col("x"),
        array(qs.map(lit): _*), lit((2 * maxN + 1).toInt)).as("p"))
      .as[(String, Seq[Double])].collect().toMap
    val exact = li.as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        g -> qs.map(q => sorted(math.ceil(q * sorted.length).toInt - 1))
      }
    for ((g, ex) <- exact)
      assert(approx(g) == ex, s"group $g: GK ${approx(g)} != nearest-rank $ex")
  }

  test("vec_decimal_sum equals the 64-slot decimal SUM form bit-for-bit") {
    // the typed vector-sum must reproduce sum(cast(x as decimal(18,8)))
    // cast back to double EXACTLY — unscaled-long addition is the same
    // integer arithmetic a decimal SUM performs — across partitions
    // (exercises partial/final merge) and with NULL vectors skipped
    val spark = SparkSpec.spark
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import graft.functions.VecDecimalSumAggregator
    val dims = 64
    val e = Tables.embeddings(spark, SparkSpec.sf).repartition(7)
    val vecSum = udaf(new VecDecimalSumAggregator(dims, 8),
      ExpressionEncoder[Seq[java.lang.Double]]())
    val viaAgg = e.groupBy("label")
      .agg(vecSum(col("embedding").cast("array<double>")).as("s"))
      .collect().map(r => r.get(0) -> r.getSeq[Double](1)).toMap
    val decSums = (0 until dims).map(i =>
      sum(element_at(col("embedding"), i + 1).cast("decimal(18,8)"))
        .cast("double").as(s"s$i"))
    val viaDecimal = e.groupBy("label").agg(decSums.head, decSums.tail: _*)
      .collect().map(r => r.get(0) ->
        (1 to dims).map(r.getDouble).toSeq).toMap
    assert(viaAgg == viaDecimal)
    // merge law: reduce-then-merge in any split equals one-shot reduce
    val a = new VecDecimalSumAggregator(3, 8)
    def row(xs: java.lang.Double*): Seq[java.lang.Double] = xs
    val rows = Seq(row(0.1, -2.5, 3.00000001), row(1.1, 2.2, -3.3),
      null, row(0.055555555, 1e9, -1e-9))
    val oneShot = rows.foldLeft(a.zero)(a.reduce).toSeq
    val split = a.merge(
      rows.take(2).foldLeft(a.zero)(a.reduce),
      rows.drop(2).foldLeft(a.zero)(a.reduce)).toSeq
    assert(oneShot == split)
    // dirty-data contract: NULL / NaN / Infinity / out-of-range
    // elements contribute nothing (SUM-over-TRY_CAST semantics) —
    // never thrown
    val dirty = Seq(
      row(1.0, 2.0, 3.0),
      Seq[java.lang.Double](null, Double.NaN, Double.PositiveInfinity),
      row(1e11, -1e11, 0.5), // |x| >= 1e10: decimal(18,8) overflow -> NULL
      row(0.25, null, Double.NegativeInfinity))
    val got = dirty.foldLeft(a.zero)(a.reduce)
      .map(l => java.math.BigDecimal.valueOf(l, 8).doubleValue()).toSeq
    assert(got == Seq(1.25, 2.0, 3.5), got)
    // ragged-vector contract (deliberate, round-5 advice): per-element
    // list-indexing semantics — a SHORT vector contributes its present
    // dims only (embedding[i] past the end is NULL -> skipped), a LONG
    // vector's tail dims are never indexed. NOT skip-the-whole-row.
    val ragged = Seq(
      row(1.0, 2.0, 3.0),
      Seq[java.lang.Double](10.0),                // short: dims 2,3 absent
      Seq[java.lang.Double](0.5, 0.5, 0.5, 99.0)) // long: dim 4 ignored
    val rg = ragged.foldLeft(a.zero)(a.reduce)
      .map(l => java.math.BigDecimal.valueOf(l, 8).doubleValue()).toSeq
    assert(rg == Seq(11.5, 2.5, 3.5), rg)
  }

  test("top-k equals sort-take on a real column across partitions") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Tables.orders(spark, SparkSpec.sf).repartition(7)
    val got = df.agg(TopKAggregator.top_k(col("o_totalprice"), 3)).as[Seq[Double]]
      .collect().head
    val expected = df.select("o_totalprice").as[Double]
      .collect().sorted(Ordering[Double].reverse).take(3).toSeq
    assert(got == expected)
  }
}
