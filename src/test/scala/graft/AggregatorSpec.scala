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
