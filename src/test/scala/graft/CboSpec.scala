package graft

import graft.queries.Cbo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** CBO join-reorder evidence (round-8 verdict #4): the IDENTICAL SQL
  * text planned with and without cost-based optimization must produce
  * DIFFERENT join orders — proof the ANALYZE'd stats actually reach
  * the planner and the reorder fires, not just that the flags parse.
  */
class CboSpec extends SparkSpec {

  /** Join-tree leaf sequence of the optimized LOGICAL plan, each leaf
    * identified by its first schema column (l_orderkey → lineitem,
    * …) — the table identity survives aliasing and pruning projects.
    */
  private def leafOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.output.headOption.map(_.name).getOrElse("?"))

  test("stats-driven join order differs from the syntactic order") {
    val sqlText = Cbo.reorderSql(spark, sf)
    val syntactic = leafOrder(spark.sql(sqlText))   // cbo off (default)
    val cbo = Cbo.cboSession(spark)
    assert(cbo.conf.get("spark.sql.cbo.enabled") == "true")
    assert(cbo.conf.get("spark.sql.cbo.joinReorder.enabled") == "true")
    val reordered = leafOrder(cbo.sql(sqlText))
    assert(syntactic.size == 5 && reordered.size == 5,
      s"expected 5 join leaves: $syntactic / $reordered")
    // written order is fact-first (lineitem leads); the DP reorder
    // must pick a different order once rowCount/NDV stats exist
    assert(syntactic.head == "l_orderkey",
      s"syntactic plan should lead with lineitem: $syntactic")
    assert(reordered != syntactic,
      s"CBO did not reorder the join: both plans are $syntactic")
  }

  test("ANALYZE persisted rowCount statistics into the catalog") {
    // read through DESCRIBE (public API): plan-level .stats outside the
    // CBO session's active scope reads the caller's SQLConf and hides
    // rowCount, so the catalog row is the reliable probe
    val t = Cbo.statsTable(spark, sf, "lineitem",
      Seq("l_orderkey", "l_extendedprice", "l_discount"))
    val statsRow = spark.sql(s"DESCRIBE TABLE EXTENDED $t")
      .filter(col("col_name") === "Statistics")
      .collect().map(_.getString(1))
    assert(statsRow.exists(_.contains("6000 rows")),
      s"expected '6000 rows' in catalog stats for $t: ${statsRow.mkString}")
  }

  test("equi-height histogram stats survive ANALYZE and reach the catalog") {
    // histograms refine range-predicate selectivity beyond min/max/NDV
    // (the estimator CBO uses for the date slice once a TimestampType
    // column carries them); prove the plumbing end-to-end on a numeric
    // key at fixture scale
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.statistics.histogram.enabled", "true")
    val t = "cbo_hist_lineitem_" + sf.replaceAll("[^A-Za-z0-9]", "_")
    if (!s2.catalog.tableExists(t))
      s2.sql(s"CREATE TABLE $t USING parquet LOCATION '$sf/lineitem.parquet'")
    s2.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS l_quantity")
    val desc = s2.sql(s"DESCRIBE EXTENDED $t l_quantity")
      .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(desc.contains("histogram"), s"no histogram row in stats:\n$desc")
    assert(desc.contains("height"), s"not an equi-height histogram:\n$desc")
  }

  test("reordered plan returns the same result as the syntactic plan") {
    val sqlText = Cbo.reorderSql(spark, sf)
    val a = spark.sql(sqlText).collect().toSeq
    val b = Cbo.cboSession(spark).sql(sqlText).collect().toSeq
    assert(a == b)
  }
}
