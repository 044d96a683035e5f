package graft

import graft.functions.{FreqSketch, MisraGriesAggregator}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: exactness below capacity, the frequency
  * guarantee past it, and merge behavior under partitioning.
  */
class FreqSketchSpec extends SparkSpec {

  test("exact regime: distinct <= k reproduces exact counts and order") {
    import spark.implicits._
    val df = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val got = df.toDF("v").repartition(7)
      .agg(FreqSketch.top_items(col("v"), topN = 3, k = 8))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got == Seq(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("heavy hitter survives past capacity with bounded undercount") {
    // 1000 distinct light items + one item at 30% frequency, k=16:
    // the hitter must survive, undercounted by at most n/(k+1)
    import spark.implicits._
    val light = (1 to 1000).map(i => s"item_$i")
    val items = (light ++ Seq.fill(500)("hot")) ++ light
    val n = items.length
    val agg = new MisraGriesAggregator(16, 16)
    var buf = agg.zero
    items.foreach(i => buf = agg.reduce(buf, i))
    val hot = agg.finish(buf).toMap.get("hot")
    assert(hot.isDefined, "frequent item evicted")
    assert(hot.get >= 500L - n / 17,
      s"undercount ${500L - hot.get} exceeds n/(k+1)=${n / 17}")
    assert(buf.used <= 16)
    // and the distributed path agrees on the survivor
    val viaSpark = items.toDF("v").repartition(13)
      .agg(FreqSketch.top_items(col("v"), topN = 1, k = 16))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(viaSpark.head.getString(0) == "hot")
  }

  test("merge rule keeps state bounded and is count-conservative") {
    val agg = new MisraGriesAggregator(4, 4)
    def buf(pairs: (String, Long)*): graft.functions.MgBuf = {
      val b = agg.zero
      pairs.zipWithIndex.foreach { case ((i, c), p) =>
        b.items(p) = i; b.counts(p) = c
      }
      b.used = pairs.length
      b
    }
    val aPairs = Map("x" -> 10L, "y" -> 5L, "z" -> 3L, "w" -> 2L)
    val bPairs = Map("x" -> 1L, "p" -> 8L, "q" -> 4L, "r" -> 2L)
    val merged = agg.merge(buf(aPairs.toSeq: _*), buf(bPairs.toSeq: _*))
    val m = (0 until merged.used)
      .map(i => merged.items(i) -> merged.counts(i)).toMap
    assert(m.size <= 4)
    // every merged count is <= the true sum and >= sum - cut
    m.foreach { case (i, c) =>
      val t = aPairs.getOrElse(i, 0L) + bPairs.getOrElse(i, 0L)
      assert(c <= t && t - c <= 3, s"$i: merged $c vs true $t")
    }
    assert(m.contains("x") && m.contains("p"))
  }
}
