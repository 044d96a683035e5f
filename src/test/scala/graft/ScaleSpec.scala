package graft

import graft.functions.KmvSketch
import graft.functions.KmvSketchAggregator
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Scale-machinery correctness: KMV sketch accuracy + merge law,
  * salted join equivalence, bucketed-table shuffle elimination,
  * streaming checkpoint idempotence.
  */
class ScaleSpec extends SparkSpec {

  test("KMV sketch is exact below k and ~3% accurate above") {
    import spark.implicits._
    // exact regime: 1500 distinct users << k
    val users = Tables.events(spark, sf)
      .agg(KmvSketch.kmv_distinct(col("user_id"), 1024)).as[Long].collect().head
    val exact = Tables.events(spark, sf)
      .agg(countDistinct(col("user_id"))).as[Long].collect().head
    assert(users == exact, s"below-k must be exact: $users vs $exact")
    // estimation regime: 6000 distinct lineitem keys vs k=256
    val approxN = Tables.lineitem(spark, sf)
      .agg(KmvSketch.kmv_distinct(col("l_orderkey") * 10000 + col("l_linenumber"), 256))
      .as[Long].collect().head
    val exactN = Tables.lineitem(spark, sf)
      .agg(countDistinct(col("l_orderkey") * 10000 + col("l_linenumber")))
      .as[Long].collect().head
    val err = math.abs(approxN - exactN).toDouble / exactN
    assert(err < 0.2, s"kmv=$approxN exact=$exactN err=$err")
  }

  test("KMV merge law: reduce(a++b) == merge(reduce(a), reduce(b))") {
    val agg = new KmvSketchAggregator(64)
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val a = List.fill(rnd.nextInt(300))(rnd.nextLong())
      val b = List.fill(rnd.nextInt(300))(rnd.nextLong())
      def red(buf: Array[Long], v: Long) = agg.reduce(buf, v)
      val direct = (a ++ b).foldLeft(agg.zero)(red)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(red), b.foldLeft(agg.zero)(red))
      assert(direct.toSeq == merged.toSeq)
    }
  }

  test("salted join equals plain join (synthetic hot key)") {
    import spark.implicits._
    // 90% of fact rows hit key 1 — the skew shape salting exists for
    val fact = (1 to 10000).map(i => (if (i % 10 == 0) i % 5 else 1, i.toDouble))
      .toDF("k", "v")
    val dim = (0 to 9).map(i => (i, s"name$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("AQE splits a skewed sort-merge partition at runtime") {
    import spark.implicits._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // test-sized thresholds: any partition 1.5x the median and over
    // 16 KB counts as skewed, split to ~16 KB chunks. At production
    // scale the defaults (256 MB advisory) play the same role.
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    import org.apache.spark.sql.functions.{col, lit, count}
    // hot key 0 holds ~90% of the fact side
    val fact = s2.range(0, 200000)
      .select(org.apache.spark.sql.functions.when(col("id") % 10 =!= 0, 0L)
        .otherwise(col("id")).as("k"), col("id").as("v"))
    val dim = s2.range(0, 200000).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    val joined = fact.join(dim, "k").agg(count(lit(1)).as("n"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("skew=true"), s"expected AQE to mark the skewed join:\n$p")
  }

  test("AQE demotes a planned sort-merge join to broadcast at runtime") {
    // The 100 TB posture: leave mid-size dims to the static estimate,
    // and let AQE re-plan from true runtime sizes. A selective filter
    // makes the static estimate conservative (SMJ) while the actual
    // build side is tiny — the final adaptive plan must have converted
    // the join to broadcast.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    // static estimate sees the full table (over threshold); runtime
    // sees the filtered few rows (under it)
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    val cust = Tables.customer(s2, sf)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") < 20)
    val joined = Tables.orders(s2, sf)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
  }

  test("bucketed tables join without a shuffle exchange") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft-wh").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val o = Tables.orders(s2, sf)
    val li = Tables.lineitem(s2, sf)
    o.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").option("path", s"$wh/lineitem_b")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      val joined = s2.table("orders_b")
        .join(s2.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == li.count())
    } finally {
      s2.sql("DROP TABLE IF EXISTS orders_b")
      s2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("streaming restart from checkpoint does not double-count") {
    val checkpoint = graft.SparkEnv.scratchDir("ckpt-replay")
    val store = new graft.streaming.InMemoryServingStore
    graft.streaming.Serving.runPipeline(spark, sf, store, checkpoint)
    val snap1 = store.snapshot().map(r => (r.key, r.nEvents)).toSet
    // restart over the SAME checkpoint: no new data -> no new batches,
    // store must be unchanged (exactly-once under replay)
    graft.streaming.Serving.runPipeline(spark, sf, store, checkpoint)
    val snap2 = store.snapshot().map(r => (r.key, r.nEvents)).toSet
    assert(snap1 == snap2)
  }

  test("partitioned serving table: reads prune to the matching partition") {
    import org.apache.spark.sql.functions._
    val dir = graft.SparkEnv.scratchDir("pruned-serving")
    // the serving-table layout: calendar bucket as the partition key
    Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"), plan)
    // pruning is real: only one partition directory's rows come back
    assert(read.select("day").distinct().count() == 1)
  }

  test("serving store lookup prunes partitions at all four granularities") {
    import org.apache.spark.sql.functions._
    import graft.streaming.{ParquetServingStore, ServingStore}
    val dir = graft.SparkEnv.scratchDir("gran-pruned-serving")
    val store = new ParquetServingStore(spark, dir)
    store.merge(0, Seq(
      ServingStore.CounterRow("click/hour/2024-01-05-13", 3, 1.0),
      ServingStore.CounterRow("click/hour/2024-01-06-02", 4, 2.0),
      ServingStore.CounterRow("click/day/2024-01-05", 7, 3.0),
      ServingStore.CounterRow("click/month/2024-01", 11, 4.0),
      ServingStore.CounterRow("click/year/2024", 11, 4.0),
      ServingStore.CounterRow("user/7/click/day/2024-01-06", 2, 5.0)))
    // a later batch re-emits one key: latest must win inside the pruned read
    store.merge(1, Seq(
      ServingStore.CounterRow("click/hour/2024-01-05-13", 5, 9.0)))
    val cases = Seq(
      ("click/hour/2024-01-05", Set("click/hour/2024-01-05-13"), "pday"),
      ("click/day/2024-01-05", Set("click/day/2024-01-05"), "pday"),
      ("click/month/2024", Set("click/month/2024-01"), "gran"),
      ("click/year/2024", Set("click/year/2024"), "gran"),
      ("user/7/click/day/", Set("user/7/click/day/2024-01-06"), "gran"))
    for ((prefix, want, prunedOn) <- cases) {
      val df = store.lookup(prefix)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains(prunedOn),
        s"$prefix: expected partition predicate on $prunedOn:\n$plan")
      assert(df.collect().map(_.getString(0)).toSet == want, prefix)
    }
    // latest-batch-wins holds through the pruned path
    val r = store.lookupRows("click/hour/2024-01-05-13")
    assert(r.map(x => (x.nEvents, x.sumValue)) == Seq((5L, 9.0)))
    // a prefix without a granularity segment still answers (unpruned):
    // 2 hour keys + day + month + year
    assert(store.lookupRows("click/").size == 5)
  }

  test("stratified sampling: per-stratum proportions hold, seed is deterministic") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25,
      "es" -> 1.0, "zh" -> 0.1)
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (lang, f) =>
      val n = totals(lang); val got = sampled.getOrElse(lang, 0L)
      // Bernoulli per row: allow generous tolerance at ~100 rows/stratum,
      // except f=1.0 which must be exact
      if (f == 1.0) assert(got == n, s"$lang: exact stratum truncated")
      else {
        val sd = math.sqrt(n * f * (1 - f))
        assert(math.abs(got - n * f) <= 4 * sd + 1, s"$lang: $got vs ${n * f}")
      }
    }
    val again = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == sampled, "same seed must reproduce the same sample")
  }

  test("decontamination df-ceiling excises a planted boilerplate gram") {
    // round-5 verdict #2: one 8-gram shared by a large doc population
    // must NOT produce its quadratic pair expansion — and the guard
    // has to act inside the aggregate, before the hot gram's doc set
    // materializes. Plant: 200 docs sharing one boilerplate 8-gram
    // (crossing the bench/train split), plus one genuine 2-doc
    // overlap that must survive untouched.
    import spark.implicits._
    val boiler = "terms of service apply to all visitors here"
    // exactly 8 tokens: the appended per-doc suffix stays outside the
    // shared 8-gram window
    val real = "unique overlapping passage that flags decontamination right now"
    val docs = (
      // hot gram: doc_ids 0..199 (both %10==0 bench docs and train docs)
      (0L until 200L).map(i => (i, s"$boiler filler$i")) ++
      // genuine overlap: bench doc 1000 (%10==0) and train doc 1001
      Seq((1000L, s"$real alpha"), (1001L, s"$real beta"))
    ).toDF("doc_id", "text")
    val out = graft.queries.Pipeline.decontaminateOverlap(docs, maxDf = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only the genuine train doc is flagged; the 180 hot-gram train
    // docs are NOT (their gram's DF = 200 > 8 -> dropped in-aggregate)
    assert(out.toSeq == Seq((1001L, 1L, 1L)), out.toSeq.take(5).toString)
    // under the ceiling, the capped form equals the uncapped
    // collect_set form exactly (same survivors, same counts)
    val small = Seq((10L, s"$real one"), (11L, s"$real two"),
      (20L, "completely different text that matches nothing at all"))
      .toDF("doc_id", "text")
    val capped = graft.queries.Pipeline.decontaminateOverlap(small, maxDf = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(capped == Seq((11L, 1L, 1L)), capped.toString)
  }

  test("bounded distinct aggregator: exact below cap, saturates at cap+1") {
    val a = new graft.functions.BoundedDistinctAggregator(4)
    def l(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    // distinct + sorted + null-skipping below the cap
    val small = Seq(l(5), l(1), null, l(5), l(3)).foldLeft(a.zero)(a.reduce)
    assert(small.toSeq == Seq(1L, 3L, 5L))
    // saturation: buffer never exceeds cap+1 elements however many
    // distinct values arrive
    val big = (1L to 100L).map(l).foldLeft(a.zero)(a.reduce)
    assert(big.length == 5, s"buffer must saturate at cap+1, got ${big.length}")
    // merge law below the cap: split reduction equals one-shot
    val xs = Seq(l(9), l(2), l(7), l(2))
    val oneShot = xs.foldLeft(a.zero)(a.reduce).toSeq
    val split = a.merge(
      xs.take(2).foldLeft(a.zero)(a.reduce),
      xs.drop(2).foldLeft(a.zero)(a.reduce)).toSeq
    assert(oneShot == split && oneShot == Seq(2L, 7L, 9L))
    // merged saturation stays capped
    val m = a.merge((1L to 50L).map(l).foldLeft(a.zero)(a.reduce),
      (100L to 150L).map(l).foldLeft(a.zero)(a.reduce))
    assert(m.length == 5, s"merged buffer must stay capped, got ${m.length}")
  }
}
