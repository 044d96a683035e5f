package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the driver-generated fixture contract (FIXTURES.md).
  *
  * Round-6 post-mortem: the driver regenerated `/root/testdata` mid-round
  * and flipped `events.ts` from timestamp[ns] to timestamp[us]; the
  * ns-assuming loader silently collapsed 30 days of 2024 into ~43
  * minutes of 1970 and 18 oracle queries went red with zero local test
  * failures (QueriesSmokeSpec only asserts count()>0). This spec turns
  * any such fixture drift into a named local failure by asserting the
  * *measured properties* every oracle query depends on, at both the
  * suite sf (0.001) and the driver's correctness sf (0.01).
  */
class FixtureDriftSpec extends SparkSpec {
  private val sf001 = "/root/testdata/sf0.001"
  private val sf01  = "/root/testdata/sf0.01"
  private val sf1   = "/root/testdata/sf0.1"

  test("events.ts loads as µs TimestampType spanning January 2024, at every sf") {
    for (dir <- Seq(sf001, sf01, sf1)) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir: events.ts must surface as TimestampType after the unit-aware loader")
      val r = ev.agg(
        min(col("ts")).as("lo"), max(col("ts")).as("hi"),
        countDistinct(date_trunc("hour", col("ts"))).as("hours"),
        countDistinct(to_date(col("ts"))).as("days")).head()
      val (lo, hi) = (r.getTimestamp(0).toString, r.getTimestamp(1).toString)
      assert(lo.startsWith("2024-01"), s"$dir: events.ts min=$lo, expected January 2024 — " +
        "a 1970 value means the loader misread the parquet timestamp unit (round-6 bug)")
      assert(hi.startsWith("2024-01"), s"$dir: events.ts max=$hi, expected January 2024")
      assert(r.getLong(3) >= 29L, s"$dir: expected ~30 distinct event days, got ${r.getLong(3)}")
      if (dir != sf001) // 10k+ events cover essentially every hour of the month
        assert(r.getLong(2) >= 700L, s"$dir: expected ≥700 distinct hourly buckets, got ${r.getLong(2)}")
      // q_psi_drift's baseline cutoff (2024-01-08) must fall INSIDE the
      // span: days before it form the baseline, days at/after it are
      // scored — if a regenerated fixture moves the calendar, the query
      // would silently emit NULL psi (empty baseline) or zero rows
      assert(lo < "2024-01-08", s"$dir: PSI baseline week empty (min=$lo)")
      assert(hi >= "2024-01-08", s"$dir: PSI has no scored days (max=$hi)")
      // q_incremental_rollup's non-vacuity: ≥2 distinct weeks (untouched
      // path) and a cutoff day that is NOT the Monday of its week (merge
      // path hits existing base keys) — currently 5 weeks, last day a
      // Tuesday, at every sf
      val wk = ev.agg(
        countDistinct(date_trunc("week", col("ts"))).as("weeks"),
        max(to_date(col("ts"))).as("maxd"),
        max(date_trunc("week", col("ts")).cast("date")).as("maxw")).head()
      assert(wk.getLong(0) >= 2L, s"$dir: rollup untouched path needs ≥2 weeks")
      assert(wk.getDate(1).toLocalDate.isAfter(wk.getDate(2).toLocalDate),
        s"$dir: rollup merge path vacuous — last day ${wk.getDate(1)} is the " +
          s"Monday of its week (no earlier base rows in the touched week)")
      // round-10 (ADVICE r9): the PSI/decay-attribution cents binning
      // leans on Spark DIV ≡ DuckDB // — which only holds for
      // NONNEGATIVE cents (for negatives, DIV truncates toward zero
      // while // floors). A regenerated fixture with refunds
      // (negative values) would silently flip bin assignment between
      // engines for q_psi_drift / q_stream_psi_drift /
      // q_decay_attribution — pin the precondition where the other
      // round-9 preconditions are pinned.
      val minV = ev.agg(min(col("value"))).head().getDouble(0)
      assert(minV >= 0.0, s"$dir: events.value has negatives (min=$minV) — " +
        "the DIV ≡ // equivalence the cents binning relies on breaks")
    }
  }

  test("table cardinalities match FIXTURES.md") {
    val expected001 = Map(
      "region" -> 5L, "nation" -> 25L, "supplier" -> 10L, "customer" -> 150L,
      "part" -> 200L, "orders" -> 1500L, "events" -> 1000L,
      "documents" -> 500L, "embeddings" -> 500L)
    for ((t, n) <- expected001) {
      val got = (if (t == "events") Tables.events(spark, sf001) else Tables.load(spark, sf001, t)).count()
      assert(got == n, s"sf0.001/$t: expected $n rows, got $got")
    }
    assert(Tables.events(spark, sf01).count() == 10000L, "sf0.01/events: expected 10000 rows")
    assert(Tables.documents(spark, sf01).count() == 500L, "sf0.01/documents: expected 500 rows")
  }

  test("events columns: 5 event types, dense user ids, single-key JSON props") {
    val ev = Tables.events(spark, sf001)
    val r = ev.agg(
      countDistinct(col("event_type")).as("types"),
      countDistinct(col("user_id")).as("users"),
      max(col("user_id")).as("max_uid"),
      sum(when(col("props").rlike("""^\{"k": ?-?\d+\}$"""), 0).otherwise(1)).as("bad_props")).head()
    assert(r.getLong(0) == 5L, s"expected 5 event types, got ${r.getLong(0)}")
    assert(r.getLong(1) == 15L, s"expected 15 distinct users at sf0.001, got ${r.getLong(1)}")
    assert(r.getLong(2) == 14L, s"expected user ids 0..14 at sf0.001, got max ${r.getLong(2)}")
    assert(r.getLong(3) == 0L, s"${r.getLong(3)} props rows are not single-key {\"k\": int} JSON")
  }

  test("embeddings: dim 64, unit-norm, labels 0..9") {
    val em = Tables.embeddings(spark, sf001)
    val r = em.select(
      size(col("embedding")).as("dim"),
      abs(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x) - 1.0d).as("norm_err"),
      col("label"))
      .agg(min(col("dim")), max(col("dim")), max(col("norm_err")),
           min(col("label")), max(col("label"))).head()
    assert(r.getInt(0) == 64 && r.getInt(1) == 64, s"embedding dim drifted: ${r.getInt(0)}..${r.getInt(1)}")
    assert(r.getDouble(2) < 1e-5, s"embeddings not unit-norm: max |‖v‖²-1| = ${r.getDouble(2)}")
    assert(r.getInt(3) == 0 && r.getInt(4) == 9, "labels must span 0..9")
  }

  test("documents: 5 langs, 20 sources, planted ' dup' near-duplicate markers") {
    val docs = Tables.documents(spark, sf001)
    val r = docs.agg(
      countDistinct(col("lang")).as("langs"),
      countDistinct(col("source")).as("sources"),
      sum(when(col("text").endsWith(" dup"), 1).otherwise(0)).as("dups"),
      countDistinct(col("text")).as("distinct_texts")).head()
    assert(r.getLong(0) == 5L, s"expected 5 langs, got ${r.getLong(0)}")
    assert(r.getLong(1) == 20L, s"expected 20 sources, got ${r.getLong(1)}")
    assert(r.getLong(2) == 25L, s"expected 25 planted ' dup' rows at sf0.001, got ${r.getLong(2)}")
    assert(r.getLong(3) == 500L, "all 500 sf0.001 texts must be distinct (exact-dedup sentinel)")
  }

  test("q_edit_distance gate is non-vacuous at the driver's sf (round-7 bug: 0 rows both sides passes trivially)") {
    for (dir <- Seq(sf01, sf1)) {
      val n = queries.Functions2.editDistancePairs.fn(spark, dir).count()
      assert(n > 0L, s"$dir: q_edit_distance blocking predicate selects no pairs — " +
        "the oracle gate is vacuous; widen the doc_id cap / length band")
    }
  }

  test("q_sketch_percentiles stays in the sketch's exact regime at both graded sfs " +
      "(every (returnflag, month) group < 4096 = 2k values, else the hash gate would drift)") {
    for (dir <- Seq(sf01, sf1)) {
      val maxGroup = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")))
        .count().agg(max("count")).head().getLong(0)
      assert(maxGroup < 4096L, s"$dir: largest (returnflag, month) lineitem group is " +
        s"$maxGroup ≥ 4096 — the k=2048 quantile sketch would compact and the " +
        "q_sketch_percentiles oracle gate stops being exact; re-key or raise k")
    }
  }

  test("q_bpe_segment's oracle CTE chain never empties: some word keeps >= 2 " +
      "BPE units after all 24 rounds at both graded sfs") {
    // The segment oracle's w_k chain CROSS JOINs each round's argmax
    // CTE; a corpus whose every word fully merges before round 24
    // empties some v_k and the whole chain after it — the oracle would
    // return one all-NULL row while Spark computes real totals
    // (round-14 review). Unit counts are monotonically non-increasing
    // per word, so "n_units_bpe > n_words at the end" certifies every
    // intermediate round had at least one mergeable pair.
    for (dir <- Seq(sf01, sf1)) {
      val row = SparkEntry.queries("q_bpe_segment")(spark, dir).head()
      val nWords = row.getLong(row.fieldIndex("n_words"))
      val nUnits = row.getLong(row.fieldIndex("n_units_bpe"))
      assert(nUnits > nWords, s"$dir: corpus fully merged within 24 BPE " +
        s"rounds (n_units_bpe=$nUnits == n_words=$nWords) — the segment " +
        "oracle's CTE chain would empty; reduce rounds or enrich the fixture")
    }
  }

  test("q_incremental_join_view's dimension delta is non-vacuous and in-domain: " +
      "changed customers (c_custkey % 97 = 0) have events, segments are the known 5") {
    // The ΔB leg of the delta rule retracts/inserts the changed keys'
    // fact history; if no changed customer ever emitted an event the
    // gate silently stops exercising dimension churn. The rotation map
    // also assumes the TPC-H segment domain — an unknown segment would
    // rotate to NULL and poison the old-snapshot groups.
    val known = Set("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    for (dir <- Seq(sf01, sf1)) {
      val segs = Tables.customer(spark, dir)
        .select("c_mktsegment").distinct().collect().map(_.getString(0)).toSet
      assert(segs.subsetOf(known),
        s"$dir: unknown customer segments ${segs -- known} — extend the rotation map")
      val active = Tables.events(spark, dir)
        .join(Tables.customer(spark, dir)
          .filter(col("c_custkey") % 97 === 0),
          col("user_id") === col("c_custkey"), "left_semi")
        .limit(1).count()
      assert(active > 0, s"$dir: no changed customer (key % 97 = 0) has any " +
        "events — q_incremental_join_view's dimension-delta leg is vacuous")
    }
  }

  test("q_incremental_user_purge's deletion delta is non-vacuous: purged users " +
      "(user_id % 1009 = 0) have events at both graded sfs") {
    for (dir <- Seq(sf01, sf1)) {
      val purged = Tables.events(spark, dir)
        .filter(col("user_id").isNotNull && col("user_id") % 1009 === 0)
        .limit(1).count()
      assert(purged > 0, s"$dir: no purged user has any events — " +
        "q_incremental_user_purge's delete leg is vacuous; widen the modulus")
    }
  }

  test("q_approx_percentiles_prod stays in GK's exact regime at DEFAULT accuracy: " +
      "every (returnflag, month) group < 5000 rows (eps*n < 0.5 at accuracy=1e4)") {
    // The round-14 production-accuracy twin keys the gate on the same
    // eps*n < 0.5 bound as q_approx_percentiles but at the shipped
    // default accuracy=1e4 — bounded sketch state, exactness carried
    // by group size instead of a blown-up accuracy knob. Past 5000
    // rows per (flag, month) the gate re-enters the estimating regime
    // (correct to spec, hash gate would go red); fail here first.
    for (dir <- Seq(sf01, sf1)) {
      val maxGroup = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")))
        .count().agg(max("count")).head().getLong(0)
      assert(maxGroup < 5000L, s"$dir: largest (returnflag, month) lineitem group is " +
        s"$maxGroup >= 5000 — q_approx_percentiles_prod leaves GK's exact " +
        "regime at accuracy=1e4; re-key or raise accuracy")
    }
  }

  test("q_upsert_merge insert keys (20000 + s_suppkey) stay outside the customer " +
      "keyspace at every graded sf (round-8 advice: key-unique MERGE precondition)") {
    // The declared delta inserts suppliers at 20000 + s_suppkey; if
    // customer keys ever reach 20000 (they do at sf>=1: 150k
    // customers) the "insert" keys collide with real customers,
    // duplicate update keys violate the documented MERGE precondition,
    // and BOTH rows land in the result. Pin the precondition where the
    // gates run so a fixture-scale bump fails a NAMED test instead of
    // silently degrading the query's semantics.
    for (dir <- Seq(sf001, sf01, sf1)) {
      val maxCust = Tables.customer(spark, dir)
        .agg(max(col("c_custkey"))).head().getLong(0)
      val minIns = 20000L + Tables.supplier(spark, dir)
        .agg(min(col("s_suppkey"))).head().getLong(0)
      assert(maxCust < 20000L,
        s"$dir: max(c_custkey)=$maxCust >= 20000 — q_upsert_merge insert keys " +
          "collide with the customer keyspace; re-site the insert key offset")
      assert(minIns > maxCust,
        s"$dir: insert keys start at $minIns <= max customer key $maxCust")
    }
  }

  test("q_heavy_hitters stays in the sketch's exact all-items regime: " +
      "fewer than k=10 distinct event types at every graded sf") {
    // The round-9 gate relies on approx_top_k(event_type, 10) returning
    // EVERY type per day with exact counts — true only while the type
    // universe stays below k (no rank-k boundary for a tie to make
    // sketch-internal) and far below map capacity. A fixture that grows
    // the type universe past 10 must fail here, not silently re-open
    // the round-7 tie blocker.
    for (dir <- Seq(sf001, sf01, sf1)) {
      val n = Tables.events(spark, dir)
        .select(countDistinct(col("event_type"))).head().getLong(0)
      assert(n < 10L, s"$dir: $n distinct event types >= k=10 — " +
        "q_heavy_hitters leaves the exact regime")
    }
  }

  test("q_kmv_distinct_users stays in the ESTIMATING regime at the graded " +
      "sfs: every per-day distinct-user count exceeds k=64") {
    // The round-12 value gate emits round(63 / frac(kth-min)) for every
    // bucket — meaningful only while per-day cardinality sits above the
    // sketch capacity (125–141 at sf0.01, 1309–1356 at sf0.1 when
    // pinned). If a fixture shrinks below k the query silently becomes
    // the exact fallback everywhere (still green, but the estimator
    // path goes untested) — fail a named test instead.
    for (dir <- Seq(sf01, sf1)) {
      val minPerDay = Tables.events(spark, dir)
        .groupBy(date_trunc("day", col("ts")))
        .agg(countDistinct(col("user_id")).as("nd"))
        .agg(min(col("nd"))).head().getLong(0)
      assert(minPerDay > 64L, s"$dir: min per-day distinct users " +
        s"$minPerDay <= k=64 — q_kmv_distinct_users leaves the estimating regime")
    }
  }

  test("q_kmv_audience_overlap stays in the sketch's exact set-algebra " +
      "regime: the user universe sits below k=4096 at every sf") {
    // Below capacity the per-type sketch state holds EVERY distinct
    // user hash, so array_intersect of two states is the exact common
    // audience — the gate's precondition. A fixture past k re-enters
    // the estimating regime (the |A∩B∩minima(U)|/k path), which is
    // spec'd, not hash-gated.
    for (dir <- Seq(sf001, sf01, sf1)) {
      val n = Tables.events(spark, dir)
        .select(countDistinct(col("user_id"))).head().getLong(0)
      assert(n < 4096L, s"$dir: $n distinct users >= k=4096 — " +
        "q_kmv_audience_overlap leaves the exact set-algebra regime")
    }
  }

  test("events carries no NULL user_id or value (the typed streaming " +
      "pipelines' encoder precondition)") {
    // Attribution.In / TimeWeighted.Ev deserialize user_id and
    // cents into PRIMITIVE Longs: a NULL would abort the streaming
    // query with a non-nullable-field error while the batch oracle
    // (LEFT-join / window semantics) would keep the row — a silent
    // engine split. The fixture has no NULLs today; this pin makes a
    // driver regeneration that introduces them fail HERE by name
    // instead of as an opaque encoder crash (round-13 review).
    for (dir <- Seq(sf001, sf01, sf1)) {
      val bad = Tables.events(spark, dir)
        .filter(col("user_id").isNull || col("value").isNull).count()
      assert(bad == 0L, s"$dir: $bad events rows with NULL user_id/value — " +
        "add null handling to Attribution/TimeWeighted (and align their " +
        "oracles) before accepting such a fixture")
    }
  }

  test("q_stream_abandoned_sessions' ms-floored timer cut equals the " +
      "oracle's microsecond cut (no session closes inside max(ts)'s ms)") {
    // Timers/watermark run at ms precision; the oracle compares
    // last_ts + 30min <= max(ts) in µs. The cuts disagree only for a
    // session whose close time shares max(ts)'s millisecond but
    // exceeds it in µs (or ties exactly under strict-< fire
    // semantics) — assert no such session exists at the graded sfs.
    for (dir <- Seq(sf01, sf1)) {
      val ev = Tables.events(spark, dir).filter(col("user_id").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t"))
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy("t")
      val sess = ev
        .withColumn("brk", when(lag(col("t"), 1).over(w).isNull
          .or(col("t") - lag(col("t"), 1).over(w) > 1800000000L), 1).otherwise(0))
        .withColumn("sid", sum(col("brk")).over(
          w.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy("user_id", "sid").agg(max(col("t")).as("lastT"))
      val mx = ev.agg(max(col("t"))).head().getLong(0)
      val disagree = sess.filter(
        ((col("lastT") + 1800000000L) <= mx) =!=
          (((col("lastT") + 1800000000L) / 1000) <= mx / 1000)).count()
      assert(disagree == 0L, s"$dir: $disagree sessions close inside " +
        "max(ts)'s millisecond — the timer and oracle cuts diverge")
    }
  }

  test("q_approx_percentiles stays in GK's provably-exact regime: every " +
      "l_returnflag group holds < 5e6 rows (eps*n < 0.5 at accuracy=1e7)") {
    // The round-12 value gate relies on eps*n < 0.5 (accuracy > 2n):
    // it blocks every g=1 sample merge AND forces GK's query tolerance
    // (targetError = eps*n) onto the exact rank — the binding
    // constraint, see AggregatorSpec's boundary test. A fixture past
    // 5e6 rows per group re-enters the estimating regime (still
    // correct to spec, but the hash gate would go red); fail a named
    // test first.
    for (dir <- Seq(sf01, sf1)) {
      val maxN = Tables.lineitem(spark, dir)
        .groupBy("l_returnflag").count()
        .agg(max(col("count"))).head().getLong(0)
      assert(maxN < 5000000L, s"$dir: max returnflag group $maxN >= 5e6 — " +
        "q_approx_percentiles leaves GK's exact regime at accuracy=1e7")
    }
  }

  test("documents.text is tab- and newline-free at every graded sf " +
      "(q_text_source's line-framing precondition)") {
    for (dir <- Seq(sf001, sf01, sf1)) {
      val bad = Tables.documents(spark, dir)
        .filter(col("text").contains("\t") || col("text").contains("\n"))
        .count()
      assert(bad == 0L, s"$dir: $bad docs carry tab/newline — " +
        "q_text_source's doc_id\\tlang\\ttext framing would be lossy")
    }
  }

  test("orders/lineitem date columns stay ms-precision in the safe 1995-2001 window") {
    val o = Tables.orders(spark, sf001)
      .agg(min(year(col("o_orderdate"))), max(year(col("o_orderdate")))).head()
    assert(o.getInt(0) >= 1995 && o.getInt(1) <= 2001,
      s"o_orderdate drifted outside 1995..2001: ${o.getInt(0)}..${o.getInt(1)}")
  }
}
