package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frontier / sweep-line analytics (round 9): the 2-D skyline
  * (Pareto-optimal set) and peak interval concurrency — two operators
  * whose NAIVE forms are quadratic self-joins and whose scalable forms
  * are attribute-bounded reductions. Both declared queries are the
  * scalable form; correctness against the quadratic definition is
  * pinned in FrontierSpec (brute-force dominance / per-day recount at
  * sf0.001).
  */
object Frontier {

  /** Pareto frontier of `part` under (minimize p_retailprice,
    * maximize p_size): a part is dominated iff some part has
    * price ≤ AND size ≥ with at least one strict.
    *
    * 100 TB shape — the skyline decomposes by the discrete dimension:
    *   1. within a size, only min-price rows can survive (dominance
    *      inside a size group is price-only) → one map-side-combinable
    *      window/aggregate per size, fully parallel, corpus-sized
    *      input reduced to ≤ |distinct sizes| × price-ties rows;
    *   2. across sizes, a candidate is dominated iff some STRICTLY
    *      larger size reached a price ≤ its own → a running min over
    *      the per-size price frontier, |distinct sizes| rows total
    *      (50 here; bounded by attribute cardinality, not data size).
    * The only single-partition step runs on step-2's tiny relation —
    * the classic sort-based skyline would instead globally sort the
    * corpus. The oracle replays the same two-stage SQL; FrontierSpec
    * holds the independent NOT-EXISTS brute force (they agree at every
    * sf, verified at build time with DuckDB at sf0.001/0.01/0.1).
    */
  val qSkyline = DeclaredQuery(
    "q_skyline",
    """WITH c AS (
      |  SELECT p_partkey, p_size, p_retailprice,
      |         min(p_retailprice) OVER (PARTITION BY p_size) AS minp
      |  FROM part),
      |cand AS (
      |  SELECT p_partkey, p_size, p_retailprice FROM c
      |  WHERE p_retailprice = minp),
      |g AS (SELECT p_size, min(p_retailprice) AS gp FROM cand GROUP BY 1),
      |gg AS (
      |  SELECT p_size, min(gp) OVER (ORDER BY p_size DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above
      |  FROM g)
      |SELECT p_partkey, p_size, p_retailprice
      |FROM cand JOIN gg USING (p_size)
      |WHERE best_above IS NULL OR best_above > p_retailprice
      |ORDER BY p_retailprice, p_partkey""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d).select("p_partkey", "p_size", "p_retailprice")
    val perSize = Window.partitionBy("p_size")
    // checkpointed: cand feeds both the per-size frontier AND the final
    // join — without the cut each consumer would rescan + re-window the
    // corpus (the q_minhash_near_dups round-8 lesson). Output is
    // ≤ |sizes| × price-ties rows, bounded.
    val cand = p.withColumn("minp", min("p_retailprice").over(perSize))
      .filter(col("p_retailprice") === col("minp"))
      .select("p_partkey", "p_size", "p_retailprice")
      .localCheckpoint()
    val g = cand.groupBy("p_size").agg(min("p_retailprice").as("gp"))
    // |distinct sizes| rows — the single-partition window is bounded
    // by attribute cardinality, never by corpus size
    val downSizes = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val gg = g.withColumn("best_above", min("gp").over(downSizes))
      .select("p_size", "best_above")
    cand.join(broadcast(gg), "p_size")
      .filter(col("best_above").isNull || col("best_above") > col("p_retailprice"))
      .select("p_partkey", "p_size", "p_retailprice")
      .orderBy("p_retailprice", "p_partkey")
  }

  /** Peak concurrent open orders per month. Each order is open for a
    * deterministic fulfillment window [orderdate, orderdate +
    * (o_orderkey % 90) + 1 days); concurrency at day d = open orders
    * spanning d; the query reports each month's peak and its start
    * count.
    *
    * 100 TB shape — the sweep line collapses BEFORE it serializes:
    * interval endpoints aggregate to per-day (+starts, −ends) deltas
    * in one map-side-combinable pass, so the running-sum window runs
    * over calendar-grain rows (~2,400 days here; 36,500 for a century),
    * bounded by the calendar, not the fact table. The month-start
    * padding rows make the carried level observable in months whose
    * event days all sit below the level inherited from the previous
    * month (an end-heavy month after a burst) — without them a
    * monthly max over event days alone under-reports. Integer deltas,
    * date arithmetic only — no floats to gate.
    */
  val qPeakConcurrency = DeclaredQuery(
    "q_peak_concurrency",
    """WITH iv AS (
      |  SELECT CAST(o_orderdate AS DATE) AS sd,
      |         CAST(o_orderdate AS DATE)
      |           + CAST((o_orderkey % 90) + 1 AS INTEGER) AS ed
      |  FROM orders),
      |ev AS (
      |  SELECT sd AS day, 1 AS delta FROM iv
      |  UNION ALL SELECT ed AS day, -1 AS delta FROM iv),
      |dd AS (
      |  SELECT day, sum(delta) AS delta,
      |         sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS n_starts
      |  FROM ev GROUP BY day),
      |pad AS (SELECT DISTINCT date_trunc('month', day)::DATE AS day FROM dd),
      |allday AS (
      |  SELECT day, sum(delta) AS delta, sum(n_starts) AS n_starts FROM (
      |    SELECT day, delta, n_starts FROM dd
      |    UNION ALL SELECT day, 0, 0 FROM pad) u
      |  GROUP BY day),
      |lvl AS (
      |  SELECT day, n_starts,
      |         sum(delta) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_cnt
      |  FROM allday)
      |SELECT date_trunc('month', day)::DATE AS month,
      |       CAST(max(open_cnt) AS BIGINT) AS peak_open,
      |       CAST(sum(n_starts) AS BIGINT) AS n_starts
      |FROM lvl GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val iv = Tables.orders(s, d).select(
      col("o_orderdate").cast("date").as("sd"),
      date_add(col("o_orderdate").cast("date"),
        ((col("o_orderkey") % 90) + 1).cast("int")).as("ed"))
    // both endpoints from ONE scan: explode a 2-struct array instead of
    // a self-union (which would read the fact table twice)
    val ev = iv.select(explode(array(
        struct(col("sd").as("day"), lit(1).as("delta")),
        struct(col("ed").as("day"), lit(-1).as("delta")))).as("e"))
      .select(col("e.day").as("day"), col("e.delta").as("delta"))
    // calendar-grain (one row per active day) — checkpointed because
    // both the union body and the month-start padding derive from it;
    // without the cut each consumer rescans the fact table
    val dd = ev.groupBy("day").agg(
      sum("delta").as("delta"),
      sum(when(col("delta") === 1, 1).otherwise(0)).as("n_starts"))
      .localCheckpoint()
    val pad = dd.select(trunc(col("day"), "month").as("day")).distinct()
      .select(col("day"), lit(0L).as("delta"), lit(0L).as("n_starts"))
    val allday = dd.select("day", "delta", "n_starts").unionAll(pad)
      .groupBy("day").agg(sum("delta").as("delta"), sum("n_starts").as("n_starts"))
    // calendar-grain running sum: input already reduced to one row per
    // active day, so the unpartitioned window is bounded (~2.4k rows)
    val sweep = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allday.withColumn("open_cnt", sum("delta").over(sweep))
      .groupBy(trunc(col("day"), "month").as("month"))
      .agg(max("open_cnt").cast("long").as("peak_open"),
        sum("n_starts").cast("long").as("n_starts"))
      .orderBy("month")
  }

  val all: Seq[DeclaredQuery] = Seq(qSkyline, qPeakConcurrency)
}
