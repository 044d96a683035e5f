package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Bucketed co-located join evidence (sources/BucketedTables): the
  * join between two tables bucketed+sorted on the join key must be a
  * SortMergeJoin with ZERO shuffle exchanges in its subtree — the
  * plan property that makes pre-bucketed fact joins viable at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.inputPlan
    case other => other
  }

  test("bucketed orders-lineitem join has no exchange below the SortMergeJoin") {
    val df = BucketedTables.joinSession(spark)
      .sql(BucketedTables.joinSql(spark, sf))
    val plan = unwrap(df.queryExecution.executedPlan)
    val smjs = plan.collect { case j: SortMergeJoinExec => j }
    assert(smjs.size == 1, s"expected exactly 1 SortMergeJoin:\n$plan")
    val shufflesBelowJoin = smjs.head.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shufflesBelowJoin.isEmpty,
      s"bucketed join still shuffles:\n$plan")
    // the scans themselves must be the bucketed relations (8 buckets)
    assert(plan.toString.contains("SelectedBucketsCount: 8 out of 8"),
      s"join is not reading bucketed scans:\n$plan")
  }

  test("bucketed join returns the same rows as the plain fixture join") {
    val viaBuckets = BucketedTables.joinSession(spark)
      .sql(BucketedTables.joinSql(spark, sf)).collect().toSeq
    Tables.orders(spark, sf).createOrReplaceTempView("bj_orders")
    Tables.lineitem(spark, sf).createOrReplaceTempView("bj_lineitem")
    val plain = spark.sql(
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4)))
        |       AS DOUBLE) AS revenue
        |FROM bj_orders JOIN bj_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin).collect().toSeq
    assert(viaBuckets == plain)
  }
}
