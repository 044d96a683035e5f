package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond plain buckets (SURVEY.md §2 C7/C8, I3):
  * as-of join, range/interval join, session windows. All timestamps
  * are second-truncated in BOTH engines before any gap/inequality
  * logic — the events fixture's physical unit is driver-controlled
  * and has flipped between ns and µs across regenerations
  * (FIXTURES.md trap 1), so portable queries never rely on
  * sub-second precision. (Exception: q_funnel_conversions compares
  * epoch MICROseconds — exact in both engines for ns data too, since
  * every fixture ns value was µs-aligned.)
  */
object Temporal {

  /** Shared as-of inputs: clicks collapsed to one per (user, second)
    * (max event_id — makes at-or-before ties deterministic across
    * engines) and the purchase projection. Both the union+window and
    * the native-operator forms consume exactly these, and both carry
    * [[asofOracleSql]] — a drift in one would break the other's gate
    * or the AsOfJoinSpec equivalence test, so they live here once.
    */
  private def asofInputs(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("sec"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id", "sec").agg(max("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("sec"))
    (purchases, clicks)
  }

  private val asofOracleSql =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |            CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec FROM events),
      |clicks AS (SELECT user_id, sec, max(event_id) AS click_id
      |           FROM e WHERE event_type = 'click' GROUP BY user_id, sec),
      |purchases AS (SELECT event_id AS purchase_id, user_id, sec
      |              FROM e WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id, c.click_id,
      |       CAST(epoch(p.sec) - epoch(c.sec) AS BIGINT) AS lag_seconds
      |FROM purchases p
      |ASOF JOIN clicks c ON p.user_id = c.user_id AND c.sec <= p.sec
      |ORDER BY purchase_id""".stripMargin

  /** C8 as-of join, scalable union+window form: for each purchase, the
    * latest click of the same user at-or-before it. No theta join: tag
    * and union both sides, sort within user, carry the last click
    * forward with an ignore-nulls window — O(n log n), one shuffle on
    * user_id. Oracle: DuckDB's native ASOF JOIN.
    */
  val asofJoin = DeclaredQuery("q_asof_join", asofOracleSql) { (s, d) =>
    val (purchases, clicks) = asofInputs(s, d)
    // union trick: click rows sort before purchase rows at the same
    // second (is_click desc) => at-or-before semantics (<=)
    val tagged = purchases
      .select(col("user_id"), col("sec"), lit(0).as("is_click"),
        col("purchase_id"), lit(null).cast("long").as("c_id"),
        lit(null).cast("timestamp").as("c_sec"))
      .unionByName(clicks.select(col("user_id"), col("sec"), lit(1).as("is_click"),
        lit(null).cast("long").as("purchase_id"),
        col("click_id").as("c_id"), col("sec").as("c_sec")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("is_click").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_id", last("c_id", ignoreNulls = true).over(w))
      .withColumn("last_click_sec", last("c_sec", ignoreNulls = true).over(w))
      .filter(col("is_click") === 0 && col("last_click_id").isNotNull)
      .select(col("purchase_id"), col("user_id"),
        col("last_click_id").as("click_id"),
        (unix_timestamp(col("sec")) - unix_timestamp(col("last_click_sec")))
          .as("lag_seconds"))
      .orderBy("purchase_id")
  }

  /** C8 as-of join, native-operator form: the SAME query as
    * q_asof_join (same [[asofInputs]], same oracle), executed by the
    * custom whole-operator plan ([[graft.plans.AsOfJoinPlan]] →
    * AsOfJoinExec via the injected planner strategy): shuffle each
    * side once on user_id, sort by (user_id, sec), forward-only merge
    * per co-partition — O(L+R) after sort, no pair materialization
    * (Spark's own RewriteAsOfJoin would expand every candidate pair
    * then min_by them away). Same oracle → the custom exec is
    * hash-gated.
    */
  val asofNative = DeclaredQuery("q_asof_native", asofOracleSql) { (s, d) =>
    val (purchases, clicks0) = asofInputs(s, d)
    // fresh attribute ids for the right side (AsOf.join contract)
    val clicks = clicks0.select(col("user_id").as("c_user_id"),
      col("sec").as("c_sec"), col("click_id"))
    graft.operators.AsOf.join(purchases, clicks,
        leftKeys = Seq(purchases("user_id")),
        rightKeys = Seq(clicks("c_user_id")),
        leftTime = purchases("sec"), rightTime = clicks("c_sec"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_timestamp(col("sec")) - unix_timestamp(col("c_sec")))
          .as("lag_seconds"))
      .orderBy("purchase_id")
  }

  /** C7 range/interval join, scalable bucket form: intervals (per
    * event_type: [first event, +3 days)) are exploded into day
    * buckets; events equi-join on their day bucket, then the precise
    * range filter applies. At scale this replaces an O(n·m) theta join
    * with a shuffle on the bucket key. Oracle: plain theta join (same
    * result, fine at fixture scale).
    */
  val rangeJoin = DeclaredQuery(
    "q_range_join",
    """WITH iv AS (
      |  SELECT event_type AS iv_type,
      |         CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS iv_start,
      |         CAST(date_trunc('second', min(ts)) AS TIMESTAMP) + INTERVAL 3 DAY AS iv_end
      |  FROM events GROUP BY event_type)
      |SELECT iv.iv_type, count(*) AS n_events,
      |       count(DISTINCT e.user_id) AS n_users
      |FROM iv JOIN (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec
      |              FROM events) e
      |  ON e.sec >= iv.iv_start AND e.sec < iv.iv_end
      |GROUP BY iv.iv_type
      |ORDER BY iv.iv_type""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("second", col("ts")).as("sec"))
    val iv = Tables.events(s, d)
      .groupBy(col("event_type").as("iv_type"))
      .agg(date_trunc("second", min(col("ts"))).as("iv_start"))
      .withColumn("iv_end", col("iv_start") + expr("INTERVAL 3 DAYS"))
    // explode each interval into its covered day-buckets
    val ivDays = iv.select(col("iv_type"), col("iv_start"), col("iv_end"),
      explode(sequence(
        date_trunc("day", col("iv_start")),
        date_trunc("day", col("iv_end")),
        expr("INTERVAL 1 DAY"))).as("day_bucket"))
    val evDays = ev.withColumn("day_bucket", date_trunc("day", col("sec")))
    evDays.join(broadcast(ivDays), Seq("day_bucket"))
      .filter(col("sec") >= col("iv_start") && col("sec") < col("iv_end"))
      .groupBy("iv_type")
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
      .orderBy("iv_type")
  }

  /** I3 session windows in batch: Spark's native session_window vs a
    * gaps-and-islands oracle (lag + running flag sum). New session
    * only when the gap STRICTLY exceeds 30 min: Spark merges touching
    * windows (an event exactly at prev+gap joins the session —
    * verified against a real 30:00 gap at sf0.1); session_end = last
    * event + gap.
    */
  val sessionWindows = DeclaredQuery(
    "q_session_windows",
    """WITH e AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec, value
      |           FROM events),
      |m AS (SELECT user_id, sec, value,
      |        CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec) IS NULL
      |               OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec)
      |                  > INTERVAL 30 MINUTE
      |             THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |s AS (SELECT user_id, sec, value,
      |        sum(new_s) OVER (PARTITION BY user_id ORDER BY sec
      |                         ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM m)
      |SELECT user_id, min(sec) AS session_start,
      |       max(sec) + INTERVAL 30 MINUTE AS session_end,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    graft.streaming.Windows.sessions(
      Tables.events(s, d).withColumn("ts", date_trunc("second", col("ts"))))
      .orderBy("user_id", "session_start")
  }

  /** I6 in the judged registry: the per-user click→purchase funnel
    * runs through the REAL arbitrary-stateful operator
    * (flatMapGroupsWithState, batch execution — identical semantics to
    * the streaming run, which StreamingSpec exercises). A purchase
    * converts the latest unconsumed click; the oracle derives the same
    * pairs with windowed SQL: last click at-or-before each purchase,
    * converting iff the previous purchase predates that click.
    * Tie-safety: fixtures have no (user, ts) duplicates among
    * click/purchase rows (verified at sf0.01 and sf0.1), so the
    * state machine's intra-timestamp ordering never engages.
    */
  val funnelConversions = DeclaredQuery(
    "q_funnel_conversions",
    """WITH cp AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |w AS (
      |  SELECT user_id, event_type, ts_us,
      |         max(CASE WHEN event_type = 'click' THEN ts_us END)
      |           OVER (PARTITION BY user_id ORDER BY ts_us, event_type
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts_us,
      |         max(CASE WHEN event_type = 'purchase' THEN ts_us END)
      |           OVER (PARTITION BY user_id ORDER BY ts_us, event_type
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase
      |  FROM cp)
      |SELECT user_id, click_ts_us, ts_us AS purchase_ts_us,
      |       ts_us - click_ts_us AS latency_us
      |FROM w
      |WHERE event_type = 'purchase' AND click_ts_us IS NOT NULL
      |  AND (prev_purchase IS NULL OR prev_purchase < click_ts_us)
      |ORDER BY user_id, purchase_ts_us""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.streaming.Windows.FunnelEvent
    val funnelEvents = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[FunnelEvent]
    graft.streaming.Windows.conversions(s, funnelEvents).toDF()
      .select("user_id", "click_ts_us", "purchase_ts_us", "latency_us")
      .orderBy("user_id", "purchase_ts_us")
  }

  val all: Seq[DeclaredQuery] =
    Seq(asofJoin, asofNative, rangeJoin, sessionWindows, funnelConversions)
}
