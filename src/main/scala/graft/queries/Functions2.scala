package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second function-surface battery (SURVEY.md §2 H/E/J4 depth):
  * regexp functions, higher-order array functions, date/interval
  * arithmetic, conditional/null functions, value-range window frames,
  * bitwise aggregates + median, edit-distance pairs, and generator
  * (posexplode) output — each with a DuckDB oracle twin.
  *
  * Cross-engine parity notes baked into the oracles:
  *  - Spark `regexp_replace` is global; DuckDB needs the 'g' flag.
  *  - Spark `dayofweek` is 1-based (Sun=1); DuckDB's is 0-based.
  *  - Spark `size`/`length`/`datediff`/`levenshtein` return INT; every
  *    integer output is cast to long/BIGINT on BOTH sides (DuckDB
  *    `len` returns BIGINT, and its `sum` returns HUGEINT→float64 in
  *    pandas — see the round-1 hash-mismatch lesson).
  *  - `add_months`/`last_day` return DATE in Spark → cast to
  *    timestamp both sides (session TZ is pinned UTC in SparkEnv).
  */
object Functions2 {

  /** H1 depth: regexp extract/replace/match/extract_all. */
  val regexpFuncs = DeclaredQuery(
    "q_regexp_funcs",
    """SELECT doc_id,
      |  regexp_extract(text, '([a-z]+)o([a-z]+)', 1) AS before_o,
      |  regexp_replace(text, '[aeiou]', '_', 'g')[1:24] AS devowel,
      |  CAST(regexp_matches(text, 'data|query') AS INT) AS mentions_data,
      |  CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS BIGINT) AS n_long_words
      |FROM documents
      |WHERE doc_id < 100
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        regexp_extract(col("text"), "([a-z]+)o([a-z]+)", 1).as("before_o"),
        substring(regexp_replace(col("text"), "[aeiou]", "_"), 1, 24).as("devowel"),
        col("text").rlike("data|query").cast("int").as("mentions_data"),
        size(expr("regexp_extract_all(text, '[a-z]{5,}', 0)"))
          .cast("long").as("n_long_words"))
      .orderBy("doc_id")
  }

  /** H4 depth: higher-order functions — transform, filter, exists,
    * forall, aggregate (fold) — over per-doc token arrays. These are
    * the composable array lambdas a training-data pipeline lives on;
    * all run inside one projection, no explode/re-agg round trip.
    */
  val hofFuncs = DeclaredQuery(
    "q_hof_funcs",
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS BIGINT) AS n_long,
      |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_len,
      |  CAST(list_max(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS max_len,
      |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 7)) > 0 AS INT) AS has_gt7,
      |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) >= 2)) = len(string_split(text, ' ')) AS INT) AS all_ge2
      |FROM documents
      |WHERE doc_id < 100
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), t -> length(t) > 4))")
          .cast("long").as("n_long"),
        expr("aggregate(transform(split(text, ' '), t -> length(t)), 0, (acc, x) -> acc + x)")
          .cast("long").as("sum_len"),
        expr("array_max(transform(split(text, ' '), t -> length(t)))")
          .cast("long").as("max_len"),
        expr("exists(split(text, ' '), t -> length(t) > 7)")
          .cast("int").as("has_gt7"),
        expr("forall(split(text, ' '), t -> length(t) >= 2)")
          .cast("int").as("all_ge2"))
      .orderBy("doc_id")
  }

  /** H2 depth: calendar arithmetic — add_months, last_day, datediff,
    * quarter truncation, day-of-week, ISO week.
    */
  val dateArith = DeclaredQuery(
    "q_date_arith",
    """SELECT o_orderkey,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
      |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom,
      |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
      |  CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr,
      |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      |  CAST(weekofyear(o_orderdate) AS BIGINT) AS woy
      |FROM orders
      |WHERE o_orderkey < 50
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 50)
      .select(col("o_orderkey"),
        add_months(col("o_orderdate"), 3).cast("timestamp").as("plus3m"),
        last_day(col("o_orderdate")).cast("timestamp").as("eom"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp"))
          .cast("long").as("days_since"),
        date_trunc("quarter", col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        weekofyear(col("o_orderdate")).cast("long").as("woy"))
      .orderBy("o_orderkey")
  }

  /** Conditional / null-handling scalars: coalesce, nullif, least,
    * greatest, CASE — over account balances (fixtures include
    * negatives, so the clamps are exercised both ways).
    */
  val condNullFuncs = DeclaredQuery(
    "q_cond_null_funcs",
    """SELECT c_custkey,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_rewrite,
      |  round(greatest(c_acctbal, 0.0), 2) AS bal_clamped,
      |  round(least(c_acctbal, 1000.0), 2) AS bal_capped,
      |  CASE WHEN c_acctbal < 0 THEN 'neg'
      |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
      |  CAST(c_acctbal IS NULL AS INT) AS bal_is_null
      |FROM customer
      |WHERE c_custkey < 200
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_custkey") < 200)
      .select(col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg_rewrite"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_clamped"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_capped"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_band"),
        col("c_acctbal").isNull.cast("int").as("bal_is_null"))
      .orderBy("c_custkey")
  }

  /** E3 depth: value-range window frame (RANGE BETWEEN n PRECEDING) —
    * peer rows enter by VALUE distance, not row position, so the
    * result is deterministic under ties without any tiebreak. The
    * frame sum goes through decimal (exact under any accumulation
    * order).
    */
  val windowRangeFrame = DeclaredQuery(
    "q_window_range_frame",
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_orderkey ORDER BY l_quantity
      |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_near_sum
      |FROM lineitem
      |WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("l_orderkey").orderBy("l_quantity")
      .rangeBetween(-5, Window.currentRow)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("l_quantity"),
        sum(col("l_quantity").cast("decimal(18,2)")).over(w)
          .cast("double").as("qty_near_sum"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Bitwise aggregates + exact median (both engines interpolate the
    * even-count case identically for doubles).
    */
  val bitwiseMedian = DeclaredQuery(
    "q_bitwise_median",
    """SELECT l_returnflag,
      |  CAST(bit_and(l_orderkey) AS BIGINT) AS key_and,
      |  CAST(bit_or(l_orderkey) AS BIGINT) AS key_or,
      |  CAST(bit_xor(l_orderkey) AS BIGINT) AS key_xor,
      |  CAST(median(l_quantity) AS DOUBLE) AS med_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        bit_and(col("l_orderkey")).as("key_and"),
        bit_or(col("l_orderkey")).as("key_or"),
        bit_xor(col("l_orderkey")).as("key_xor"),
        median(col("l_quantity")).cast("double").as("med_qty"))
      .orderBy("l_returnflag")
  }

  /** K2 adjunct: exact edit-distance verification over a blocked
    * candidate set (same-source docs with near-equal lengths — the
    * blocking any 100 TB pipeline would do before paying O(n·m)
    * levenshtein; the quadratic pair space is bounded to one block).
    * Blocking band (doc_id < 500, |Δchars| ≤ 10) is sized so the gate
    * is NON-vacuous on current fixtures: ~260 pairs at both sf0.01 and
    * sf0.1 (a 0-row result would pass the hash compare trivially —
    * FixtureDriftSpec pins non-emptiness so fixture drift can't
    * silently vacate the gate again).
    */
  val editDistancePairs = DeclaredQuery(
    "q_edit_distance",
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
      |FROM documents a JOIN documents b
      |  ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE a.doc_id < 500 AND b.doc_id < 500
      |  AND abs(a.n_chars - b.n_chars) <= 10
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
    val a = docs.select(col("doc_id").as("id_a"), col("source"),
      col("text").as("text_a"), col("n_chars").as("nc_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("source").as("source_b"),
      col("text").as("text_b"), col("n_chars").as("nc_b"))
    a.join(b, col("source") === col("source_b") && col("id_a") < col("id_b") &&
        abs(col("nc_a") - col("nc_b")) <= 10)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("lev"))
      .orderBy("id_a", "id_b")
  }

  /** J4 generator output surface: posexplode with 0-based positions;
    * the oracle reproduces ordinality with a LATERAL generate_series
    * (DuckDB has no WITH ORDINALITY).
    */
  val posexplodeTokens = DeclaredQuery(
    "q_posexplode_tokens",
    """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM documents WHERE doc_id < 20) t,
      |  LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("tok"))
      .orderBy("doc_id", "pos")
  }

  /** D5 sketch-storage path, rows-only by design: DataSketches HLL
    * partial sketches per (day, event_type), merged two ways — per-day
    * via hll_union_agg and estimated via hll_sketch_estimate. This is
    * the 100 TB shape for distinct-count serving: store the BINARY
    * sketch column per partition, merge at read time (associative,
    * re-aggregable at any rollup level) — exactly what a Redis-PFADD
    * serving layer would hold. Estimates are engine-specific, so no
    * DuckDB hash gate (the exact twin is q_events_distinct_users_daily).
    */
  val hllSketch = DeclaredQuery.noOracle("q_hll_sketch_users") { (s, d) =>
    val perTypeDay = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"),
        col("user_id"))
      .groupBy("day", "event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))
    perTypeDay
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .cast("long").as("approx_users"))
      .orderBy("day")
  }

  /** ANSI-safe arithmetic: Spark 4 runs with ANSI mode on, where /0
    * throws — try_divide is the declarative opt-out (NULL on error),
    * mirrored in the oracle with nullif. The 100 TB point: one poison
    * row must not kill a 10-hour job; try_* keeps the error local.
    */
  val tryArith = DeclaredQuery(
    "q_try_arith",
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN l_discount = 0 THEN NULL
      |    ELSE CAST(round(l_extendedprice / nullif(l_discount, 0), 2) AS DECIMAL(22,2)) END) AS DOUBLE) AS sum_price_per_disc,
      |  CAST(count(*) FILTER (WHERE l_discount = 0) AS BIGINT) AS n_zero_disc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        sum(round(try_divide(col("l_extendedprice"), col("l_discount")), 2)
          .cast("decimal(22,2)")).cast("double").as("sum_price_per_disc"),
        count(when(col("l_discount") === 0, lit(1))).as("n_zero_disc"))
      .orderBy("l_returnflag")
  }

  /** Ordered string aggregation (round 9): `listagg ... WITHIN GROUP
    * (ORDER BY ...)` (new in Spark 4) ≡ DuckDB's ordered
    * `string_agg`. The WITHIN-GROUP order is what makes the
    * concatenation deterministic and therefore hash-gateable — an
    * unordered listagg varies with partition order and could never
    * pass the gate. Per region: the ordered nation roster and the
    * region's customer count (counts aggregated BEFORE the roster
    * join, so the listagg input stays one row per nation).
    */
  val listaggRoster = DeclaredQuery(
    "q_listagg",
    """SELECT r_name,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |       CAST(sum(n_cust) AS BIGINT) AS n_customers
      |FROM (SELECT n.n_regionkey, n.n_name, count(c.c_custkey) AS n_cust
      |      FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      |      GROUP BY 1, 2) x
      |JOIN region ON r_regionkey = n_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
    val perNation = Tables.nation(s, d).as("n")
      .join(Tables.customer(s, d).as("c"),
        col("c.c_nationkey") === col("n.n_nationkey"), "left")
      .groupBy(col("n.n_regionkey"), col("n.n_name"))
      .agg(count(col("c.c_custkey")).as("n_cust"))
    perNation
      .join(broadcast(Tables.region(s, d)),
        col("r_regionkey") === col("n_regionkey"))
      .groupBy("r_name")
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        sum("n_cust").cast("long").as("n_customers"))
      .orderBy("r_name")
  }

  val all: Seq[DeclaredQuery] = Seq(
    regexpFuncs, hofFuncs, dateArith, condNullFuncs, windowRangeFrame,
    bitwiseMedian, editDistancePairs, posexplodeTokens, hllSketch, tryArith,
    listaggRoster)
}
