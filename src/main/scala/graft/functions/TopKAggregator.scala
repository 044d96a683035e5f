package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed mergeable top-k aggregator (SURVEY.md §2 D9/J2): keeps the k
  * largest doubles per group in a bounded buffer — the associative/
  * commutative shape that lets Spark run it partial+final across any
  * number of partitions (the property ScalaTest checks:
  * agg(a ++ b) == merge(agg(a), agg(b))). The reference's ZINCRBY
  * top-N leaderboards, as a first-class aggregate function.
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.empty

  override def reduce(buf: Array[Double], v: Double): Array[Double] =
    insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Double]): Array[Double] = buf

  private def insert(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length < k) (buf :+ v).sortBy(-_)
    else if (v > buf.last) (buf.dropRight(1) :+ v).sortBy(-_)
    else buf
  }

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column aggregate: array of the k largest values, descending. */
  def top_k(c: Column, k: Int): Column =
    udaf(new TopKAggregator(k), Encoders.scalaDouble).apply(c)
}
