package graft.sources

import graft.{DeclaredQuery, SparkEnv, Tables}
import org.apache.spark.sql.functions._

/** External text-format ingest (SURVEY.md §2 A-rows at the format
  * boundary; round-7 verdict #10): CSV and JSON Lines sources driven
  * through the judged oracle gate, not just test round-trips. Each
  * query exports a fixture table to the text format, re-ingests it
  * with `spark.read.{csv,json}` under an EXPLICIT footer-derived
  * schema — the production pattern: `inferSchema` costs a second full
  * scan and can mis-type columns, so a real pipeline always pins the
  * schema from its catalog — and aggregates the re-ingested relation.
  * The oracle computes the same aggregate from the parquet original,
  * so the gate proves format-fidelity end-to-end (quoting/escaping
  * through CSV, timestamp round-trip through JSON).
  *
  * Scale shape: the export is a straight columnar→text rewrite
  * (map-only, no shuffle) and the ingest is a splittable text scan —
  * at 100 TB both parallelize per-file/per-split exactly like the
  * parquet path; the aggregate is the same map-side-partial hash
  * aggregate as everywhere else. Double columns survive text exactly
  * (Java's shortest-round-trip double formatting on write, exact
  * parse on read), which is what lets the DECIMAL-cast sums hash-match
  * the parquet-side oracle.
  */
object ExternalFormats {

  /** CSV ingest: the full customer table (its comment/address strings
    * exercise quoting) through a header CSV round trip, then the
    * segment rollup. Explicit schema from the parquet footer.
    */
  val qCsvSource = DeclaredQuery(
    "q_csv_source",
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val src = Tables.customer(s, d)
    val dir = SparkEnv.scratchDir("graft-csv-src")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    s.read.schema(src.schema).option("header", "true").csv(dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  /** JSON Lines ingest: orders through a JSONL round trip (timestamp
    * columns serialize ISO-8601 and re-parse under the explicit
    * schema; o_orderdate is midnight-aligned so the default
    * millisecond write format is lossless), then the status rollup.
    */
  val qJsonSource = DeclaredQuery(
    "q_json_source",
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(min(year(o_orderdate)) AS BIGINT) AS min_year,
      |  CAST(max(year(o_orderdate)) AS BIGINT) AS max_year
      |FROM orders
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val src = Tables.orders(s, d)
    val dir = SparkEnv.scratchDir("graft-json-src")
    src.write.mode("overwrite").json(dir)
    s.read.schema(src.schema).json(dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        min(year(col("o_orderdate"))).cast("long").as("min_year"),
        max(year(col("o_orderdate"))).cast("long").as("max_year"))
      .orderBy("o_orderstatus")
  }

  val all: Seq[DeclaredQuery] = Seq(qCsvSource, qJsonSource)
}
