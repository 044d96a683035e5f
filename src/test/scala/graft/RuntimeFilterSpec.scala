package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join reduction (SURVEY §4.2 free-Catalyst
  * machinery, round 9): when one join side carries a selective
  * filter, Spark can inject `bloom_filter_might_contain` on the other
  * side BELOW its existing shuffle — row-level pruning that at 100 TB
  * removes most of a fact-side aggregate/join shuffle for
  * dimension-filtered joins (the non-partition-column cousin of
  * dynamic partition pruning, which q_ann_ivf's plan already
  * exercises).
  *
  * InjectRuntimeFilter's preconditions (read from the rule, verified
  * by measurement): the application side must ALREADY contain a
  * shuffle for the filter to be beneficial (`probablyHasShuffle` — a
  * bare scan-join gets nothing because the filter would not save a
  * shuffle), the join must be a probable SHUFFLE join (a
  * broadcast-able side prunes via reuse instead), and the application
  * side must exceed a scan-size threshold that defaults to 10 GB
  * (real-deployment sizing). The spec lowers the size threshold and
  * disables broadcast in a cloned session — the both-sides-huge
  * regime the rule targets — and asserts the rewrite actually
  * happens, plus result equality against the filter-free plan.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def bloomSession(): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "1KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2
  }

  /** Per-order revenue rollup (shuffle on the fact side) joined to a
    * selectively-filtered dim — the beneficial-filter shape.
    */
  private def shape(s: SparkSession) = {
    val perOrder = s.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("order_rev"))
    val urgent = s.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    perOrder.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum("order_rev").as("rev"))
  }

  test("selective dim join injects a bloom runtime filter below the fact shuffle") {
    val p = shape(bloomSession()).queryExecution.optimizedPlan.toString
    // the injected pair prints as bloom_filter_agg (creation side) +
    // might_contain (application side probe)
    assert(p.contains("bloom_filter_agg") && p.contains("might_contain"),
      s"no runtime bloom filter injected:\n$p")
    // and the probe sits BELOW the fact-side aggregate, i.e. it prunes
    // rows before the shuffle — the property that pays at 100 TB
    val probeIdx = p.indexOf("might_contain")
    val aggIdx = p.indexOf("Aggregate [l_orderkey")
    assert(aggIdx >= 0 && probeIdx > aggIdx,
      s"probe not below the fact aggregate:\n$p")
  }

  test("bloom-filtered plan returns the same result as the filter-free plan") {
    val off = spark.newSession()
    off.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    assert(shape(bloomSession()).collect().toSeq == shape(off).collect().toSeq)
  }
}
