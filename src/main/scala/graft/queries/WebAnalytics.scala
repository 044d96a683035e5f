package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-layer web-analytics reports — the reference's home domain
  * (a web-stats aggregator): marketing attribution, rolling active
  * users, bounce rate, value histograms. Each composes operators the
  * engine already proves (as-of union+window, gaps-and-islands
  * sessionization, explode-dedup sliding distinct) into the REPORT a
  * dashboard would actually serve, and each is fully DuckDB-value-
  * gated. Timestamps are second-truncated in both engines
  * (FIXTURES.md trap 1).
  */
object WebAnalytics {

  /** Last-touch attribution with a 1-hour lookback: each purchase is
    * attributed to the same user's latest click at-or-before it IF
    * that click is ≤ 3600 s old, else counted organic. The as-of
    * pairing is the q_asof_join union+window shape (one shuffle on
    * user_id, no pair expansion) with LEFT semantics — purchases with
    * no prior click stay in the report as organic. Oracle: DuckDB
    * ASOF LEFT JOIN + the same tolerance cut.
    *
    * 100 TB: identical scale story to q_asof_join; the daily report
    * aggregate is a second tiny shuffle on the day key.
    */
  /** Shared by the batch query and its streaming twin
    * (q_stream_attribution) — one oracle, two execution models.
    */
  private val attributionOracleSql =
    """WITH e AS (SELECT user_id, event_type, value,
      |            CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec
      |          FROM events WHERE user_id IS NOT NULL),
      |clicks AS (SELECT DISTINCT user_id, sec FROM e WHERE event_type = 'click'),
      |purchases AS (SELECT user_id, sec, value FROM e WHERE event_type = 'purchase'),
      |a AS (SELECT p.user_id, p.sec, p.value, c.sec AS c_sec
      |      FROM purchases p
      |      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.sec <= p.sec)
      |SELECT CAST(sec AS DATE) AS day,
      |       count(*) AS n_purchases,
      |       CAST(sum(CASE WHEN c_sec IS NOT NULL
      |                      AND epoch(sec) - epoch(c_sec) <= 3600
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
      |       CAST(sum(CASE WHEN c_sec IS NOT NULL
      |                      AND epoch(sec) - epoch(c_sec) <= 3600
      |                     THEN CAST(value AS DECIMAL(18,2))
      |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |         AS attributed_revenue
      |FROM a GROUP BY 1 ORDER BY day""".stripMargin

  val attribution = DeclaredQuery(
    "q_attribution", attributionOracleSql) { (s, d) =>
    // NULL-user guard on BOTH engines at the same grain (round-15
    // review, the q_stream_dedup_users discipline): the streaming twin
    // decodes user_id into a primitive Long, so an unguarded null row
    // would CRASH the stream while the oracle counted it as organic
    val e = Tables.events(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        col("value"), date_trunc("second", col("ts")).as("sec"))
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "sec").distinct()
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "sec", "value")
    // union trick with LEFT semantics: clicks sort before purchases at
    // the same second (is_click desc) => at-or-before (<=) ties match
    val tagged = purchases
      .select(col("user_id"), col("sec"), lit(0).as("is_click"), col("value"),
        lit(null).cast("timestamp").as("c_sec"))
      .unionByName(clicks.select(col("user_id"), col("sec"),
        lit(1).as("is_click"), lit(null).cast("double").as("value"),
        col("sec").as("c_sec")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("is_click").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributed = col("last_click_sec").isNotNull &&
      (unix_timestamp(col("sec")) - unix_timestamp(col("last_click_sec"))) <= 3600
    tagged
      .withColumn("last_click_sec", last("c_sec", ignoreNulls = true).over(w))
      .filter(col("is_click") === 0)
      .groupBy(to_date(col("sec")).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(attributed, 1).otherwise(0)).cast("long").as("n_attributed"),
        sum(when(attributed, col("value").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("attributed_revenue"))
      .orderBy("day")
  }

  /** Daily actives + rolling 7-day actives. Sliding DISTINCT cannot be
    * pre-aggregated, so the scalable form is explode-dedup: each
    * (user, active-day) pair contributes to the 7 report days it can
    * influence, then a second distinct + count per report day — linear
    * in |pairs|×7, never a per-day re-scan of the corpus. The oracle
    * states the same thing as a day-range join.
    */
  val rollingActives = DeclaredQuery(
    "q_rolling_dau",
    """WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY day),
      |wau AS (SELECT d.day, count(DISTINCT p.user_id) AS wau7
      |        FROM dau d JOIN pairs p
      |          ON p.day <= d.day AND p.day >= d.day - 6
      |        GROUP BY d.day)
      |SELECT day, dau, wau7 FROM dau JOIN wau USING (day)
      |ORDER BY day""".stripMargin) { (s, d) =>
    val pairs = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      // lazy lineage cut (round-14 review): dau and the explode side
      // both consume pairs; without it each re-plans the events scan
      // + the distinct exchange
      .localCheckpoint(false)
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = pairs
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
        col("user_id"))
      .distinct()
      .join(dau.select("day"), "day") // report only days that exist
      .groupBy("day").agg(count(lit(1)).as("wau7"))
    dau.join(wau, "day").select("day", "dau", "wau7").orderBy("day")
  }

  /** Per-day session count and bounce rate (single-event sessions /
    * sessions), on the same strict->30-min gaps-and-islands machinery
    * as q_session_windows; a session belongs to the day it starts.
    */
  val bounceRate = DeclaredQuery(
    "q_bounce_rate",
    """WITH e AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec
      |           FROM events),
      |m AS (SELECT user_id, sec,
      |        CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec) IS NULL
      |               OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec)
      |                  > INTERVAL 30 MINUTE
      |             THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |s AS (SELECT user_id, sec,
      |        sum(new_s) OVER (PARTITION BY user_id ORDER BY sec
      |                         ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM m),
      |sess AS (SELECT user_id, sid, min(sec) AS session_start, count(*) AS n_events
      |         FROM s GROUP BY user_id, sid)
      |SELECT CAST(session_start AS DATE) AS day,
      |       count(*) AS n_sessions,
      |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_bounces,
      |       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) /
      |             CAST(count(*) AS DOUBLE), 6) AS bounce_rate
      |FROM sess GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy("sec")
    val sessions = Tables.events(s, d)
      .select(col("user_id"), date_trunc("second", col("ts")).as("sec"))
      .withColumn("new_s",
        when(lag("sec", 1).over(byUser).isNull ||
          col("sec").cast("long") - lag("sec", 1).over(byUser).cast("long") > 1800,
          1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("sec").as("session_start"), count(lit(1)).as("n_events"))
    sessions
      .groupBy(to_date(col("session_start")).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1).otherwise(0)).cast("long")
          .as("n_bounces"))
      .withColumn("bounce_rate",
        round(col("n_bounces") / col("n_sessions").cast("double"), 6))
      .orderBy("day")
  }

  /** Fixed-width value histogram per event type: 20 buckets of 25
    * over [0, 500), top bucket clamped — the dashboard distribution
    * tile. Pure map-side bucketing + one aggregate; the bucket
    * formula is exact-identical integer/IEEE arithmetic in both
    * engines.
    */
  val valueHistogram = DeclaredQuery(
    "q_value_histogram",
    """SELECT event_type,
      |       least(CAST(floor(value / 25) AS BIGINT), 19) AS bucket,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"),
        least(floor(col("value") / 25).cast("long"), lit(19L)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type", "bucket")
  }

  /** Hourly traffic anomaly score: each hour's event count against
    * the trailing 24 TIME-hours (RANGE frame on epoch seconds,
    * [now−24h, now−1h] — correct under sparse hours, unlike a
    * rows-frame), z = (n − mean)/stddev. The window statistics are
    * derived from EXACT integer sums (Σn, Σn², count over the frame —
    * counts are integers, so sumsq is exact) with one final sqrt:
    * identical IEEE arithmetic in both engines, no dependence on
    * either engine's streaming-variance accumulation order. Hours
    * with an undersized baseline (<2 trailing hours) report NULL z
    * and are never flagged.
    */
  val anomalyHours = DeclaredQuery(
    "q_anomaly_hours",
    """WITH h AS (
      |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, count(*) AS n
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT hour, n,
      |    count(*) OVER fr AS cnt_w,
      |    sum(n) OVER fr AS sum_w,
      |    sum(n * n) OVER fr AS sumsq_w
      |  FROM h
      |  WINDOW fr AS (ORDER BY epoch(hour)
      |                RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING)),
      |zc AS (
      |  SELECT hour, n,
      |    CASE WHEN cnt_w >= 2
      |          AND sumsq_w - sum_w * (sum_w / CAST(cnt_w AS DOUBLE)) > 0 THEN
      |      (n - sum_w / CAST(cnt_w AS DOUBLE)) /
      |      sqrt((sumsq_w - sum_w * (sum_w / CAST(cnt_w AS DOUBLE)))
      |           / (cnt_w - 1))
      |    END AS z_raw,
      |    CASE WHEN cnt_w >= 2
      |          AND sumsq_w - sum_w * (sum_w / CAST(cnt_w AS DOUBLE)) <= 0
      |          AND CAST(n AS DOUBLE) <> sum_w / CAST(cnt_w AS DOUBLE)
      |         THEN 1 ELSE 0 END AS flat_spike
      |  FROM w)
      |SELECT hour, n, round(z_raw, 6) AS z,
      |       CASE WHEN abs(z_raw) > 3 OR flat_spike = 1 THEN 1 ELSE 0 END AS is_anomaly
      |FROM zc ORDER BY hour""".stripMargin) { (s, d) =>
    val h = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    zScoresFromHourlyCounts(h)
  }

  /** The shared z-score tail of q_anomaly_hours and its streaming twin
    * (round-14 review: the 15-line block existed twice and could
    * drift one-sided under a shared oracle). Input: (hour, n).
    *
    * Zero-variance guard (round-14 review): a FLAT trailing baseline
    * (all window hours equal) makes the variance numerator 0, and
    * (n − mean)/0 is NULL in both engines — so an arbitrarily large
    * spike over a quiet baseline was never flagged. The guard keeps
    * z NULL (no finite z exists) but flags `flat_spike`: deviation
    * from a zero-variance baseline is the clearest possible anomaly.
    * All comparisons run on the SAME double expressions in both
    * engines (the mean is exact in the flat case: sum_w = v·cnt_w), so
    * the gate stays bit-parity.
    */
  private def zScoresFromHourlyCounts(hourly: DataFrame): DataFrame = {
    val fr = Window.orderBy(unix_timestamp(col("hour")))
      .rangeBetween(-86400, -3600)
    val mean = col("sum_w") / col("cnt_w").cast("double")
    val varNum = col("sumsq_w") - col("sum_w") * mean
    val zRaw = when(col("cnt_w") >= 2 && varNum > 0,
      (col("n") - mean) / sqrt(varNum / (col("cnt_w") - 1)))
    val flatSpike = when(col("cnt_w") >= 2 && varNum <= 0 &&
      col("n").cast("double") =!= mean, 1).otherwise(0)
    hourly
      .withColumn("cnt_w", count(lit(1)).over(fr))
      .withColumn("sum_w", sum("n").over(fr))
      .withColumn("sumsq_w", sum(col("n") * col("n")).over(fr))
      .withColumn("z_raw", zRaw)
      .withColumn("flat_spike", flatSpike)
      .select(col("hour"), col("n"),
        round(col("z_raw"), 6).as("z"),
        when(abs(col("z_raw")) > 3 || col("flat_spike") === 1, 1)
          .otherwise(0).as("is_anomaly"))
      .orderBy("hour")
  }

  /** Audience overlap between every event-type pair ("users who did A
    * and B") through KMV sketch SET ALGEBRA — the serving feature HLL
    * can't express: |A∩B| = |A| + |B| − |A∪B|, with |A∪B| a real
    * sketch union (one [[graft.functions.KmvSketch]] aggregate over
    * both types' rows — sketch merge IS set union). The 10 type pairs
    * broadcast against events (bounded-side BNLJ, ~4× row expansion),
    * one aggregate computes all three cardinalities per pair.
    *
    * k = 4096 keeps every sketch below capacity at the graded scales
    * (≤1500 users), so the inclusion–exclusion identity is EXACT and
    * the whole set-algebra path is value-gated against COUNT
    * (DISTINCT) SQL; at web scale the same query degrades to the
    * published ~1/√(k−2) estimate (k=1024 → ~3 %) instead of
    * holding per-pair exact user sets.
    */
  val audienceOverlap = DeclaredQuery(
    "q_audience_overlap",
    """WITH t AS (SELECT DISTINCT event_type FROM events),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      |      FROM t a JOIN t b ON a.event_type < b.event_type),
      |c AS (SELECT p.type_a, p.type_b, e.event_type, e.user_id
      |      FROM p JOIN events e
      |        ON e.event_type = p.type_a OR e.event_type = p.type_b)
      |SELECT type_a, type_b,
      |  CAST(count(DISTINCT CASE WHEN event_type = type_a THEN user_id END)
      |       AS BIGINT) AS n_a,
      |  CAST(count(DISTINCT CASE WHEN event_type = type_b THEN user_id END)
      |       AS BIGINT) AS n_b,
      |  count(DISTINCT user_id) AS n_union,
      |  CAST(count(DISTINCT CASE WHEN event_type = type_a THEN user_id END)
      |     + count(DISTINCT CASE WHEN event_type = type_b THEN user_id END)
      |     - count(DISTINCT user_id) AS BIGINT) AS n_overlap
      |FROM c GROUP BY type_a, type_b
      |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
    import graft.functions.KmvSketch.kmv_distinct
    val k = 4096
    val e = Tables.events(s, d).select("event_type", "user_id")
    val types = e.select("event_type").distinct()
    val pairs = types.select(col("event_type").as("type_a"))
      .join(types.select(col("event_type").as("type_b")),
        col("type_a") < col("type_b"))
    e.join(broadcast(pairs),
        col("event_type") === col("type_a") || col("event_type") === col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(
        kmv_distinct(when(col("event_type") === col("type_a"), col("user_id")), k)
          .as("n_a"),
        kmv_distinct(when(col("event_type") === col("type_b"), col("user_id")), k)
          .as("n_b"),
        kmv_distinct(col("user_id"), k).as("n_union"))
      .withColumn("n_overlap", col("n_a") + col("n_b") - col("n_union"))
      .orderBy("type_a", "type_b")
  }

  /** The REAL streaming pipeline behind the same report: file-source
    * events → per-user transformWithState click index (LEFT as-of with
    * 1-h tolerance, exact-cents money) → complete-mode daily
    * aggregation — gated by the identical oracle SQL as the batch
    * query (stream–batch unification, checked by hash).
    */
  val streamAttribution = DeclaredQuery(
    "q_stream_attribution", attributionOracleSql) { (s, d) =>
    graft.streaming.Attribution.dailyReport(s, d)
  }

  /** Daily funnel-latency percentiles: click→purchase conversion
    * latency p50/p95 per purchase day, over the SAME conversion
    * relation as q_funnel_conversions (windowed last-click form, both
    * engines). Exact interpolated percentiles (percentile ≡
    * quantile_cont — the equivalence q_percentiles pins); epoch-µs
    * arithmetic is exact in both engines.
    */
  val funnelLatency = DeclaredQuery(
    "q_funnel_latency",
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
      |  FROM cp),
      |conv AS (
      |  SELECT CAST(make_timestamp(ts_us) AS DATE) AS day,
      |         ts_us - click_ts_us AS latency_us
      |  FROM w
      |  WHERE event_type = 'purchase' AND click_ts_us IS NOT NULL
      |    AND (prev_purchase IS NULL OR prev_purchase < click_ts_us))
      |SELECT day, count(*) AS n_conversions,
      |       quantile_cont(latency_us, 0.5) AS p50_latency_us,
      |       quantile_cont(latency_us, 0.95) AS p95_latency_us
      |FROM conv GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_type"))
    val upToNow = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val beforeNow = byUser.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("click_ts_us",
        max(when(col("event_type") === "click", col("ts_us"))).over(upToNow))
      .withColumn("prev_purchase",
        max(when(col("event_type") === "purchase", col("ts_us"))).over(beforeNow))
      .filter(col("event_type") === "purchase" && col("click_ts_us").isNotNull &&
        (col("prev_purchase").isNull || col("prev_purchase") < col("click_ts_us")))
      .groupBy(timestamp_micros(col("ts_us")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_conversions"),
        percentile(col("ts_us") - col("click_ts_us"), lit(0.5))
          .as("p50_latency_us"),
        percentile(col("ts_us") - col("click_ts_us"), lit(0.95))
          .as("p95_latency_us"))
      .orderBy("day")
  }

  /** Dense per-minute event counts with gap filling — the time-spine
    * pattern every monitoring dashboard needs (a bucket aggregate
    * alone silently drops empty minutes). The spine generates from
    * the corpus' own [min, max] minute bounds (one tiny aggregate,
    * broadcast), left-joins the per-minute counts, zero-fills.
    * ~43 k spine rows per month regardless of corpus size.
    */
  val denseMinutes = DeclaredQuery(
    "q_dense_minutes",
    """WITH b AS (SELECT min(date_trunc('minute', ts)) AS lo,
      |                  max(date_trunc('minute', ts)) AS hi FROM events),
      |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MINUTE))
      |                      AS TIMESTAMP) AS minute FROM b),
      |c AS (SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
      |             count(*) AS n FROM events GROUP BY 1)
      |SELECT s.minute, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
      |FROM spine s LEFT JOIN c USING (minute)
      |ORDER BY minute""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val spine = e
      .agg(min(date_trunc("minute", col("ts"))).as("lo"),
        max(date_trunc("minute", col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 MINUTE"))).as("minute"))
    val counts = e.groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"))
    spine.join(counts, Seq("minute"), "left")
      .select(col("minute"), coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("minute")
  }

  /** The hour-bucketed click→purchase candidate relation shared by
    * the linear and decay attribution models (round-14 review: the
    * ~15-line scaffold — distinct clicks, purchase cents, the
    * two-bucket explode, the equi-join and the inclusive 3600 s
    * tolerance — existed verbatim in both; a tolerance change in one
    * model only would silently diverge). Output: one row per
    * (purchase pid, cents, psec) × qualifying click sec.
    */
  private def attributionCandidates(e: DataFrame): DataFrame = {
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec")).distinct()
      .withColumn("hb", floor(unix_timestamp(col("sec")) / 3600))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("sec").as("psec"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("hb",
        explode(array(floor(unix_timestamp(col("psec")) / 3600),
          floor(unix_timestamp(col("psec")) / 3600) - 1)))
    purchases.join(clicks, Seq("user_id", "hb"))
      .filter(col("sec") <= col("psec") &&
        unix_timestamp(col("psec")) - unix_timestamp(col("sec")) <= 3600)
  }

  /** Linear (equal-share) multi-touch attribution: every click within
    * the hour before a purchase shares that purchase's value equally,
    * and credit aggregates to the CLICK's day — where budget
    * decisions actually look. The candidate join is hour-bucketed
    * (each purchase probes its own and the previous hour bucket) so
    * it stays an equi-join at scale, never a theta join; exact-cents
    * integer division keeps the credited sum order-independent and
    * engine-identical (the deterministic floor is the documented
    * semantic, same trade as q_stream_attribution's cents).
    */
  val linearAttribution = DeclaredQuery(
    "q_linear_attribution",
    """WITH e AS (SELECT event_id, user_id, event_type, value,
      |            CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec FROM events),
      |clicks AS (SELECT DISTINCT user_id, sec FROM e WHERE event_type = 'click'),
      |purchases AS (SELECT event_id, user_id, sec,
      |                     CAST(round(value * 100) AS BIGINT) AS cents
      |              FROM e WHERE event_type = 'purchase'),
      |cand AS (
      |  SELECT p.event_id AS pid, p.cents, CAST(c.sec AS DATE) AS cday,
      |         count(*) OVER (PARTITION BY p.event_id) AS n
      |  FROM purchases p JOIN clicks c
      |    ON c.user_id = p.user_id
      |   AND c.sec BETWEEN p.sec - INTERVAL 3600 SECOND AND p.sec)
      |SELECT cday AS day,
      |       count(*) AS n_credited_clicks,
      |       CAST(sum(cents // n) AS BIGINT) AS credited_cents
      |FROM cand GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), date_trunc("second", col("ts")).as("sec"))
    val cand = attributionCandidates(e)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("pid")))
    cand.groupBy(col("sec").cast("date").as("day"))
      .agg(count(lit(1)).as("n_credited_clicks"),
        sum(expr("cents div n")).as("credited_cents"))
      .orderBy("day")
  }

  /** Read-time anomaly scoring over the STREAMING serving store: the
    * real hourly-counter pipeline (file stream → watermarked agg →
    * KV upsert, the q_stream_hourly_counters machinery) populates the
    * store; the anomaly view then reads the snapshot back, folds the
    * per-(type, hour) counters to per-hour totals, and applies the
    * identical exact-integer z-score as q_anomaly_hours — whose
    * oracle SQL gates this query verbatim. This is the reference's
    * serving split: heavy aggregation maintained incrementally,
    * analytics computed at read time over the tiny counter space.
    */
  val streamAnomalyHours = DeclaredQuery(
    "q_stream_anomaly_hours",
    anomalyHours.oracle.get) { (s, d) =>
    import graft.streaming.{InMemoryServingStore, Serving}
    import s.implicits._
    val checkpoint = graft.SparkEnv.scratchDir("graft-stream-anom-ckpt")
    val store = Serving.runPipeline(s, d, new InMemoryServingStore, checkpoint)
    val hourly = store.snapshot().toDF()
      .select(to_timestamp(element_at(split(col("key"), "/"), 3),
        "yyyy-MM-dd-HH").as("hour"), col("nEvents"))
      .groupBy("hour").agg(sum("nEvents").as("n"))
    // identical z-score tail as the batch query — ONE implementation
    // under the shared oracle (round-14 review)
    zScoresFromHourlyCounts(hourly)
  }

  /** Time-weighted average value per (day, event type) — the metrics
    * op for IRREGULARLY sampled series (a gauge holds its value until
    * the next observation, so the plain mean over-weights bursts):
    * each event's value is weighted by the seconds until the same
    * user's next event (lead over the user timeline), and the
    * weighted mean is exact-integer arithmetic end to end —
    * cents × seconds summed as BIGINTs, one double division + round
    * at the very end, so the result is order-independent and
    * bit-identical across engines. Same-second repeat events carry
    * zero weight and are dropped identically in both engines; each
    * user's LAST event has no horizon and is excluded (standard
    * half-open TWA).
    *
    * Scale shape: one user-keyed window (the same exchange the
    * attribution/session family rides) then a (day, type) partial
    * aggregate — no self-join, no range join; at 100 TB the window
    * state is one row of lookahead per user.
    */
  private val twaOracleSql =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |         CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE user_id IS NOT NULL),
      |iv AS (
      |  SELECT event_type, sec, cents,
      |         epoch(lead(sec) OVER (PARTITION BY user_id
      |                               ORDER BY sec, event_id))
      |           - epoch(sec) AS dt
      |  FROM e)
      |SELECT CAST(sec AS DATE) AS day, event_type,
      |       count(*) AS n_intervals,
      |       CAST(sum(dt) AS BIGINT) AS total_secs,
      |       round(CAST(sum(cents * dt) AS DOUBLE) / sum(dt) / 100, 6)
      |         AS twa_value
      |FROM iv
      |WHERE dt IS NOT NULL AND dt > 0
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val timeWeightedAvg = DeclaredQuery(
    "q_time_weighted_avg", twaOracleSql) { (s, d) =>
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("event_id"))
    // NULL-user guard, both engines (see q_attribution's note)
    val e = Tables.events(s, d).filter(col("user_id").isNotNull).select(
      col("user_id"), col("event_type"), col("event_id"),
      date_trunc("second", col("ts")).as("sec"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    e.withColumn("dt",
        unix_timestamp(lead("sec", 1).over(byUser)) - unix_timestamp(col("sec")))
      .filter(col("dt").isNotNull && col("dt") > 0)
      .groupBy(to_date(col("sec")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("total_secs"),
        round(sum(col("cents") * col("dt")).cast("double") /
          sum(col("dt")) / 100, 6).as("twa_value"))
      .orderBy("day", "event_type")
  }

  /** The REAL streaming pipeline behind the TWA report
    * (`streaming/TimeWeighted.scala`: per-user carried-interval
    * transformWithState, interval emitted when the next observation
    * arrives), gated by the IDENTICAL oracle SQL as the batch query —
    * the same twin discipline as q_stream_attribution.
    */
  val streamTimeWeighted = DeclaredQuery(
    "q_stream_time_weighted", twaOracleSql) { (s, d) =>
    graft.streaming.TimeWeighted.dailyReport(s, d)
  }

  /** Path analysis — the MATCH_RECOGNIZE-shaped product-analytics op:
    * which 3-step event sequences do users actually walk? Each event
    * starts a candidate trigram with its user's next two events
    * (lead ×2 over one user window); the trigram counts iff both hops
    * stay within the 30-minute session gap (the same strict-gap rule
    * the sessionization family uses). Full daily path counts are
    * emitted — bounded by |event types|³ × days, no top-k tie-break
    * to diverge on. One user-keyed exchange serves all four leads;
    * no self-join (the naive 3-way join per step would shuffle the
    * events table three times).
    */
  val eventPaths = DeclaredQuery(
    "q_event_paths",
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |         CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec
      |  FROM events),
      |w AS (
      |  SELECT user_id, sec, event_type,
      |         lead(event_type) OVER u AS t1,
      |         lead(event_type, 2) OVER u AS t2,
      |         epoch(lead(sec) OVER u) - epoch(sec) AS g1,
      |         epoch(lead(sec, 2) OVER u) - epoch(lead(sec) OVER u) AS g2
      |  FROM e
      |  WINDOW u AS (PARTITION BY user_id ORDER BY sec, event_id))
      |SELECT CAST(sec AS DATE) AS day,
      |       event_type || '>' || t1 || '>' || t2 AS path,
      |       count(*) AS n
      |FROM w
      |WHERE t2 IS NOT NULL AND g1 <= 1800 AND g2 <= 1800
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val u = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val e = Tables.events(s, d).select(
      col("user_id"), col("event_type"), col("event_id"),
      date_trunc("second", col("ts")).as("sec"))
    e.select(col("sec"), col("event_type"),
        lead("event_type", 1).over(u).as("t1"),
        lead("event_type", 2).over(u).as("t2"),
        (unix_timestamp(lead("sec", 1).over(u)) -
          unix_timestamp(col("sec"))).as("g1"),
        (unix_timestamp(lead("sec", 2).over(u)) -
          unix_timestamp(lead("sec", 1).over(u))).as("g2"))
      .filter(col("t2").isNotNull && col("g1") <= 1800 && col("g2") <= 1800)
      .groupBy(to_date(col("sec")).as("day"),
        concat_ws(">", col("event_type"), col("t1"), col("t2")).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day", "path")
  }

  /** Floor-clamped running balance — the inventory/credit-wallet op
    * (balance += purchase, −= click, never below zero) that LOOKS
    * like it needs a stateful per-row scan (b_n = max(0, b_{n−1} +
    * x_n) is not associative), but has the classic closed form
    *   b_n = S_n − min(0, min_{j≤n} S_j)
    * — a cumulative sum and a running min of that sum, two ordinary
    * window aggregates over ONE user-keyed sort. (Induction: max(0,
    * S_n − m_{n−1}) splits on whether S_n dips below the old min.)
    * So the declared plan is plain windows — no UDAF, no recursion,
    * no per-row driver loop — and the oracle replays the identical
    * algebra. Exact integer cents throughout; one double division at
    * the end.
    */
  val runningBalance = DeclaredQuery(
    "q_running_balance",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |         CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec,
      |         CASE WHEN event_type = 'purchase'
      |              THEN CAST(round(value * 100) AS BIGINT)
      |              ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
      |  FROM events WHERE user_id < 500),
      |s AS (
      |  SELECT user_id,
      |         CAST(sum(delta) OVER w AS BIGINT) AS cum,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY sec DESC, event_id DESC) AS rdesc
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |b AS (
      |  SELECT user_id, rdesc,
      |         cum - least(CAST(0 AS BIGINT),
      |                     CAST(min(cum) OVER (PARTITION BY user_id
      |                       ORDER BY rdesc DESC
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                       AS BIGINT)) AS bal
      |  FROM s)
      |SELECT user_id, count(*) AS n_events,
      |       round(CAST(max(CASE WHEN rdesc = 1 THEN bal END) AS DOUBLE)
      |             / 100, 2) AS final_balance,
      |       round(CAST(max(bal) AS DOUBLE) / 100, 2) AS peak_balance
      |FROM b
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cents = round(col("value") * 100).cast("long")
    val e = Tables.events(s, d)
      .filter(col("user_id") < 500)
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("sec"),
        when(col("event_type") === "purchase", cents)
          .otherwise(-cents).as("delta"))
    val withCum = e
      .withColumn("cum", sum("delta").over(byUser))
      .withColumn("rdesc", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("sec").desc, col("event_id").desc)))
      .withColumn("bal", col("cum") -
        least(lit(0L), min("cum").over(byUser)))
    withCum
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(max(when(col("rdesc") === 1, col("bal"))).cast("double") / 100, 2)
          .as("final_balance"),
        round(max("bal").cast("double") / 100, 2).as("peak_balance"))
      .orderBy("user_id")
  }

  /** Time-decay attribution — the third standard model beside
    * last-touch (`q_attribution`) and linear (`q_linear_attribution`):
    * clicks closer to the purchase earn exponentially more credit.
    * The decay is discretized to 15-minute buckets within the 1-hour
    * window (q ∈ 0..4 quarters of age), weight = 2^(4−q) — so every
    * weight is an exact POWER-OF-TWO INTEGER built by bit shift, the
    * per-purchase weight mass is an exact BIGINT sum, and the credit
    * split `cents·w // Σw` is the same floor-division integer
    * arithmetic the linear model gates (no pow/exp libm call
    * anywhere — a continuous e^{−λΔt} would hash-diverge between
    * engines at the last ulp). Join shape identical to the linear
    * model: hour-bucket equi-join (purchase hour + previous hour),
    * never a time-range theta join.
    */
  val decayAttribution = DeclaredQuery(
    "q_decay_attribution",
    """WITH e AS (SELECT event_id, user_id, event_type, value,
      |            CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec FROM events),
      |clicks AS (SELECT DISTINCT user_id, sec FROM e WHERE event_type = 'click'),
      |purchases AS (SELECT event_id, user_id, sec,
      |                     CAST(round(value * 100) AS BIGINT) AS cents
      |              FROM e WHERE event_type = 'purchase'),
      |cand AS (
      |  SELECT p.event_id AS pid, p.cents, CAST(c.sec AS DATE) AS cday,
      |         CAST(1 AS BIGINT) << CAST(4 - date_diff('second', c.sec, p.sec) // 900 AS INT) AS w
      |  FROM purchases p JOIN clicks c
      |    ON c.user_id = p.user_id
      |   AND c.sec BETWEEN p.sec - INTERVAL 3600 SECOND AND p.sec),
      |wsum AS (
      |  SELECT pid, cents, cday, w,
      |         sum(w) OVER (PARTITION BY pid) AS sw
      |  FROM cand)
      |SELECT cday AS day,
      |       count(*) AS n_credited_clicks,
      |       CAST(sum(cents * w // sw) AS BIGINT) AS credited_cents
      |FROM wsum GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), date_trunc("second", col("ts")).as("sec"))
    val cand = attributionCandidates(e)
      .withColumn("w", expr(
        """shiftleft(CAST(1 AS BIGINT),
          |  CAST(4 - (unix_timestamp(psec) - unix_timestamp(sec)) DIV 900 AS INT))""".stripMargin))
      .withColumn("sw", sum("w").over(Window.partitionBy("pid")))
    cand.groupBy(col("sec").cast("date").as("day"))
      .agg(count(lit(1)).as("n_credited_clicks"),
        sum(expr("(cents * w) div sw")).as("credited_cents"))
      .orderBy("day")
  }

  val all: Seq[DeclaredQuery] =
    Seq(attribution, rollingActives, bounceRate, valueHistogram, anomalyHours,
      audienceOverlap, streamAttribution, funnelLatency, denseMinutes,
      linearAttribution, streamAnomalyHours, timeWeightedAvg,
      streamTimeWeighted, eventPaths, runningBalance, decayAttribution)
}
