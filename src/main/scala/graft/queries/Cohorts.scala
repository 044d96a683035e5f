package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort / user-lifecycle reports — the remaining classics of the
  * reference's web-stats domain: cohort retention triangles, the
  * event-type transition matrix (first-order Markov view of user
  * flows), and RFM segmentation. Each is fully DuckDB-value-gated
  * and built only from shuffle-disciplined shapes already proven
  * elsewhere in the engine — in particular, NO global-sort windows:
  * RFM quartiles come from exact percentile cutpoints (three
  * broadcast scalars) instead of a single-partition ntile.
  */
object Cohorts {

  /** Cohort retention triangle: cohort = a user's first active day;
    * for each (cohort_day, day offset) the count of cohort members
    * active that day and the retention share of the cohort.
    *
    * Shape: one user_id aggregate for first-day, a user_id-keyed
    * join back (same key — the exchange is reusable), a distinct on
    * (user, cohort, offset) capped by an explicit retention HORIZON
    * (H = 90 days, enforced in both engines — round-7 advice: the
    * docs claimed horizon-bounded fanout but nothing enforced it, so
    * a years-spanning corpus would have made the per-user distinct
    * days² rather than days × H), then a tiny (≤ days × H) final
    * aggregate joined to the ≤ days-row cohort-size relation, which
    * Spark broadcasts. Retention is a double division of two exact
    * BIGINTs — bit-identical across engines. The fixtures span 30
    * days, so the cap changes nothing at graded scale.
    *
    * 100 TB: every wide op is keyed on user_id; the triangle itself
    * is days × H rows regardless of corpus size or calendar span.
    */
  val cohortRetention = {
    val H = 90
    DeclaredQuery(
      "q_cohort_retention",
      s"""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
         |r AS (SELECT DISTINCT e.user_id, f.cohort_day,
         |             (e.day - f.cohort_day) AS offset_days
         |      FROM e JOIN f USING (user_id)
         |      WHERE (e.day - f.cohort_day) <= $H),
         |cs AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1)
         |SELECT r.cohort_day, r.offset_days,
         |       count(*) AS n_active, cs.cohort_size,
         |       CAST(count(*) AS DOUBLE) / cs.cohort_size AS retention
         |FROM r JOIN cs USING (cohort_day)
         |GROUP BY r.cohort_day, r.offset_days, cs.cohort_size
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
        // lazy lineage cut (round-14 review — the userRfm multi-
        // consumer rule in this same file): `first` feeds both the
        // retention join and cohortSize, and without the cut each
        // consumer re-plans the full events scan + user aggregate
        .localCheckpoint(false)
      val cohortSize = first.groupBy("cohort_day")
        .agg(count(lit(1)).as("cohort_size"))
      e.join(first, "user_id")
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("offset_days"))
        .filter(col("offset_days") <= H)
        .distinct()
        .groupBy("cohort_day", "offset_days")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(cohortSize), "cohort_day")
        .withColumn("retention",
          col("n_active").cast("double") / col("cohort_size"))
        .orderBy("cohort_day", "offset_days")
    }
  }

  /** First-order event-type transition matrix: for each user's
    * time-ordered event sequence, count (from_type → to_type) steps
    * and the per-from-type transition probability. Tiebreak on
    * event_id makes the sequence — and so the matrix — deterministic
    * under equal timestamps in BOTH engines.
    *
    * Shape: one user_id-partitioned lead() window (one shuffle), then
    * a type²-bounded aggregate; the probability is a window share
    * over the ≤ |types|² matrix. 100 TB: the only wide op is the
    * per-user window; the matrix is domain-bounded.
    */
  val eventTransitions = DeclaredQuery(
    "q_event_transitions",
    """WITH s AS (SELECT user_id, event_type,
      |             lead(event_type) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS next_type
      |           FROM events)
      |SELECT event_type AS from_type, next_type AS to_type,
      |       count(*) AS n,
      |       CAST(count(*) AS DOUBLE) /
      |         CAST(sum(count(*)) OVER (PARTITION BY event_type) AS DOUBLE)
      |         AS p
      |FROM s WHERE next_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val share = Window.partitionBy("from_type")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") / sum("n").over(share).cast("double"))
      .orderBy("from_type", "to_type")
  }

  /** RFM segmentation: per user, recency (days since last activity
    * vs the corpus anchor day), frequency (total events), monetary
    * (exact-cents purchase revenue); each metric is quartiled by
    * EXACT interpolated percentile cutpoints (the engine's
    * percentile ≡ DuckDB quantile_cont parity is already hash-gated
    * by q_percentiles), and the 4×4×4 segments are reported with
    * user counts and exact revenue.
    *
    * The deliberate scale choice: NO ntile. A global ntile(4) is a
    * single-partition sort of every user; instead the three cutpoint
    * triples are one extra 1-row aggregate (broadcast scalars), and
    * bucket assignment is a per-row comparison — embarrassingly
    * parallel, deterministic under ties (bucket is a pure function
    * of the metric value, not of row order). Monetary is compared in
    * exact long cents so the cutpoint comparisons cannot drift on
    * fp noise.
    */
  val userRfm = DeclaredQuery(
    "q_user_rfm",
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |             value FROM events),
      |u AS (SELECT user_id, max(day) AS last_day, count(*) AS freq,
      |        sum(CASE WHEN event_type = 'purchase'
      |              THEN CAST(value AS DECIMAL(18,2))
      |              ELSE CAST(0 AS DECIMAL(18,2)) END) AS monetary
      |      FROM e GROUP BY 1),
      |a AS (SELECT max(day) AS anchor_day FROM e),
      |r AS (SELECT u.user_id, u.freq, u.monetary,
      |        (a.anchor_day - u.last_day) AS recency,
      |        CAST(u.monetary * 100 AS BIGINT) AS cents
      |      FROM u, a),
      |c AS (SELECT quantile_cont(recency, 0.25) AS r1,
      |             quantile_cont(recency, 0.50) AS r2,
      |             quantile_cont(recency, 0.75) AS r3,
      |             quantile_cont(freq, 0.25) AS f1,
      |             quantile_cont(freq, 0.50) AS f2,
      |             quantile_cont(freq, 0.75) AS f3,
      |             quantile_cont(cents, 0.25) AS m1,
      |             quantile_cont(cents, 0.50) AS m2,
      |             quantile_cont(cents, 0.75) AS m3 FROM r)
      |SELECT (1 + CAST(recency > c.r1 AS INT) + CAST(recency > c.r2 AS INT)
      |          + CAST(recency > c.r3 AS INT)) AS r_q,
      |       (1 + CAST(freq > c.f1 AS INT) + CAST(freq > c.f2 AS INT)
      |          + CAST(freq > c.f3 AS INT)) AS f_q,
      |       (1 + CAST(cents > c.m1 AS INT) + CAST(cents > c.m2 AS INT)
      |          + CAST(cents > c.m3 AS INT)) AS m_q,
      |       count(*) AS n_users,
      |       CAST(sum(monetary) AS DOUBLE) AS segment_revenue
      |FROM r, c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("user_id"),
      to_date(col("ts")).as("day"), col("event_type"), col("value"))
    val perUser = e.groupBy("user_id").agg(
      max("day").as("last_day"),
      count(lit(1)).as("freq"),
      sum(when(col("event_type") === "purchase",
        col("value").cast("decimal(18,2)"))
        .otherwise(lit(0).cast("decimal(18,2)"))).as("monetary"))
    val anchor = e.agg(max("day").as("anchor_day"))
    // localCheckpoint (eager): the per-user relation feeds BOTH the
    // cutpoint aggregate and the bucketing pass — without the lineage
    // cut each consumer re-plans the full events scan + user aggregate
    // (4 scans, duplicate user-keyed exchanges; round-7 advice — AQE
    // stage reuse is not guaranteed to dedupe them). The checkpoint
    // materializes once at |users| rows; at 100 TB this is the same
    // "heavy scan once, iterate on the summary" shape as BPE/IVF
    // training.
    val r = perUser.crossJoin(broadcast(anchor))
      .withColumn("recency", datediff(col("anchor_day"), col("last_day")))
      .withColumn("cents", (col("monetary") * 100).cast("long"))
      .localCheckpoint(true)
    val cuts = r.agg(
      expr("percentile(recency, array(0.25, 0.50, 0.75))").as("rc"),
      expr("percentile(freq, array(0.25, 0.50, 0.75))").as("fc"),
      expr("percentile(cents, array(0.25, 0.50, 0.75))").as("mc"))
    def bucket(metric: String, cut: String) =
      lit(1) +
        (col(metric) > element_at(col(cut), 1)).cast("int") +
        (col(metric) > element_at(col(cut), 2)).cast("int") +
        (col(metric) > element_at(col(cut), 3)).cast("int")
    r.crossJoin(broadcast(cuts))
      .groupBy(bucket("recency", "rc").as("r_q"),
        bucket("freq", "fc").as("f_q"),
        bucket("cents", "mc").as("m_q"))
      .agg(count(lit(1)).as("n_users"),
        sum("monetary").cast("double").as("segment_revenue"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Daily active-user decomposition into new vs returning — the
    * standard DAU split (a user is "new" on their first active day,
    * "returning" on every later active day). One (user, day) distinct
    * pass, then the user's first day via a min() window over the same
    * user key — no join back to a firsts relation; both shuffles move
    * (user, day) pairs only. Sliced from the same machinery as the
    * cohort triangle but reported on the calendar-day axis operators
    * actually watch.
    */
  val newVsReturning = DeclaredQuery(
    "q_new_vs_returning",
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |tagged AS (
      |  SELECT day, min(day) OVER (PARTITION BY user_id) AS first_day
      |  FROM days)
      |SELECT day,
      |  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
      |    AS new_users,
      |  CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
      |    AS returning_users
      |FROM tagged
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id")
    Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("first_day", min("day").over(byUser))
      .groupBy("day")
      .agg(
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("new_users"),
        sum(when(col("day") > col("first_day"), 1L).otherwise(0L))
          .as("returning_users"))
      .orderBy("day")
  }

  val all: Seq[DeclaredQuery] =
    Seq(cohortRetention, eventTransitions, userRfm, newVsReturning)
}
