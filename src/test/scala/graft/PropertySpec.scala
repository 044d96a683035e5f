package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Remaining SURVEY.md §5.2 property laws, checked over seeded random
  * samples batched into single Spark jobs (one job per law, all
  * samples as rows — not one job per sample).
  */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  test("vec_dot: symmetry, Cauchy-Schwarz bound, self-dot = squared norm") {
    import spark.implicits._
    val pairs = Seq.fill(200)((
      Array.fill(16)(rnd.nextFloat() * 2 - 1),
      Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = pairs.toDF("a", "b").select(
      graft.functions.VectorFunctions.vec_dot(col("a"), col("b")).as("ab"),
      graft.functions.VectorFunctions.vec_dot(col("b"), col("a")).as("ba"),
      graft.functions.VectorFunctions.vec_dot(col("a"), col("a")).as("aa"),
      graft.functions.VectorFunctions.vec_dot(col("b"), col("b")).as("bb"))
    val bad = df.filter(
      col("ab") =!= col("ba") ||                       // exact: same IEEE fold
        col("aa") < 0 || col("bb") < 0 ||              // self-dot non-negative
        col("ab") * col("ab") > col("aa") * col("bb") * 1.0000001) // C-S
    assert(bad.count() == 0)
  }

  test("shingle Jaccard: J(x,x) = 1, J in [0,1], symmetric pairs") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 30L).map(i =>
      (i, Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val ids = (0L until 30L)
    val pairs =
      (ids.map(i => (i, i)) ++ Seq.fill(40)((ids(rnd.nextInt(30)), ids(rnd.nextInt(30)))))
        .distinct.toDF("id_a", "id_b")
    val j = Dedup.shingleJaccard(docs, pairs)
    // every (i,i) present with jaccard exactly 1; all values within [0,1]
    assert(j.filter(col("id_a") === col("id_b") && col("jaccard") =!= 1.0).count() == 0)
    assert(j.filter(col("id_a") === col("id_b")).count() == 30)
    assert(j.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    // symmetry: J(a,b) == J(b,a) (swap the pair columns and re-verify)
    val swapped = Dedup.shingleJaccard(docs,
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val cmp = j.select(col("id_a"), col("id_b"), col("jaccard"))
      .join(swapped.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
        col("jaccard").as("j2")), Seq("id_a", "id_b"))
    assert(cmp.filter(col("jaccard") =!= col("j2")).count() == 0)
  }

  test("language-ID: broadcast scoring equals the relational form incl. null/zero-overlap docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // corpus with a real signal, a NULL-text doc, and a doc whose
    // trigrams overlap no profile (digits never enter the top-30
    // profiles learned from the letter docs)
    val docs = ((0L until 40L).map { i =>
      val word = if (i % 2 == 0) "alphabet" else "betacarotene"
      (i, Seq.fill(12)(word).mkString(" "), if (i % 2 == 0) "aa" else "bb")
    } ++ Seq((100L, null.asInstanceOf[String], "aa"),
      (101L, "0123456789", "bb")))
      .toDF("doc_id", "text", "lang")
    val tri = TextAnalysis.docTrigrams(docs.filter(col("text").isNotNull))
    val profiles = TextAnalysis.langProfiles(tri)
    val rel = TextAnalysis.languageId(tri, profiles)
      .select("doc_id", "predicted_lang", "overlap")
    val bc = TextAnalysis.languageIdBroadcast(docs, profiles)
      .select("doc_id", "predicted_lang", "overlap")
    assert(rel.exceptAll(bc).count() == 0 && bc.exceptAll(rel).count() == 0)
    // the null-text doc is dropped by both forms (the digit doc keeps
    // a row in both: its trigrams entered the profile during learning)
    assert(bc.filter(col("doc_id") === 100L).count() == 0)
    assert(rel.filter(col("doc_id") === 101L).count() ===
      bc.filter(col("doc_id") === 101L).count())
  }

  test("tumbling windows partition the input: counts sum to total, no overlap") {
    import spark.implicits._
    // random timestamps INCLUDING exact hour boundaries (the edge that
    // would double-count if windows were closed on both ends)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val tss = Seq.fill(500)(base + rnd.nextInt(72 * 3600) * 1000L) ++
      (0 until 24).map(h => base + h * 3600 * 1000L)
    val df = tss.map(t => Tuple1(new java.sql.Timestamp(t))).toDF("ts")
    val windowed = df.groupBy(window(col("ts"), "1 hour")).count()
    assert(windowed.agg(sum("count")).head.getLong(0) == tss.size)
    // windows are half-open, aligned, hour-long, and pairwise disjoint
    val w = windowed.select(col("window.start").as("s"), col("window.end").as("e"))
    assert(w.filter(unix_timestamp(col("e")) - unix_timestamp(col("s")) =!= 3600).count() == 0)
    assert(w.filter(unix_timestamp(col("s")) % 3600 =!= 0).count() == 0)
    assert(w.select("s").distinct().count() == w.count())
  }

  test("merge_pair: randomized equivalence with the sequential reference") {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    // reference: left-to-right non-overlapping single-pass merge
    def ref(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val alphabet = Vector("a", "b", "ab", "c")
    val cases = Seq.fill(120) {
      val syms = Seq.fill(rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.size)))
      val (l, r) = (alphabet(rnd.nextInt(alphabet.size)), alphabet(rnd.nextInt(alphabet.size)))
      (syms, l, r)
    }.distinct
    // one Spark job: each case row carries its own pair; group by pair
    // so each distinct (l, r) evaluates through one MergePair instance
    for (((l, r), group) <- cases.groupBy(c => (c._2, c._3))) {
      val got = group.map(_._1).toDF("syms")
        .select(col("syms"), toColumn(graft.functions.MergePair(
          toExpression(col("syms")), l, r)).as("m"))
        .collect().map(rw => rw.getSeq[String](0) -> rw.getSeq[String](1)).toMap
      for ((syms, _, _) <- group)
        assert(got(syms) == ref(syms, l, r), s"syms=$syms pair=($l,$r)")
    }
  }

  test("ordered_pairs: pair count is C(n,2), orientation sorted, lnf = min") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      val n = rnd.nextInt(12)
      // shuffled ids: the generator must sort internally
      val elems = rnd.shuffle((0 until n).toList)
        .map(j => (j * 7L + rnd.nextInt(3), rnd.nextInt(100)))
      (i.toLong, elems)
    }
    val df = rows.toDF("bucket", "raw")
      .selectExpr("bucket",
        "transform(raw, x -> struct(x._1 AS doc_id, x._2 AS nf)) AS ids")
      .selectExpr("bucket", "ordered_pairs(ids)")
    val got = df.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((bucket, elems) <- rows) {
      val want = (for {
        Seq((ia, na), (ib, nb)) <- elems.sortBy(_._1).combinations(2).toSeq
      } yield (ia, ib, math.min(na, nb))).toSet
      assert(got.getOrElse(bucket, Set.empty) == want, s"bucket=$bucket elems=$elems")
    }
  }

  test("bounded distinct: randomized equivalence with collect_set below the cap") {
    // 50 random trials: random values, random split points, random
    // caps — below the cap the capped aggregator IS collect_set
    // (sorted); above it the sentinel (length cap+1) always fires.
    // Merge associativity: any split reduction equals one-shot.
    for (_ <- 1 to 50) {
      val cap = 1 + rnd.nextInt(8)
      val a = new graft.functions.BoundedDistinctAggregator(cap)
      val n = rnd.nextInt(30)
      val xs = Seq.fill(n)(rnd.nextInt(12).toLong)
      val boxed = xs.map(java.lang.Long.valueOf)
      val oneShot = boxed.foldLeft(a.zero)(a.reduce)
      // arbitrary 3-way split, merged in tree order
      val (s1, rest) = boxed.splitAt(rnd.nextInt(n + 1))
      val (s2, s3) = rest.splitAt(rnd.nextInt(rest.size + 1))
      val merged = a.merge(a.merge(
        s1.foldLeft(a.zero)(a.reduce), s2.foldLeft(a.zero)(a.reduce)),
        s3.foldLeft(a.zero)(a.reduce))
      val distinct = xs.distinct.sorted
      if (distinct.size <= cap) {
        assert(oneShot.toSeq == distinct, s"cap=$cap xs=$xs")
        assert(merged.toSeq == distinct, s"merged: cap=$cap xs=$xs")
      } else {
        assert(oneShot.length == cap + 1, s"sentinel: cap=$cap xs=$xs")
        assert(merged.length == cap + 1, s"merged sentinel: cap=$cap xs=$xs")
      }
    }
  }

  test("ExactSum.moneySum: randomized bit-parity with decimal sums, grouped + split") {
    // 10 trials × random 2-decimal money values (incl. negatives and
    // values big enough that the double product is inexact): the
    // scaled-long hi/lo form must equal the decimal-cast discipline
    // bit-for-bit, per group, under random repartitioning.
    import spark.implicits._
    for (t <- 1 to 10) {
      val n = 200 + rnd.nextInt(300)
      val rows = Seq.fill(n)((rnd.nextInt(7).toString,
        math.round(rnd.nextDouble() * 2e7 - 1e7) / 100.0,
        math.round(rnd.nextDouble() * 10) / 100.0))
      val df = rows.toDF("k", "price", "disc").repartition(1 + rnd.nextInt(6))
      val got = df.groupBy("k")
        .agg(graft.functions.ExactSum.moneySum("price * (1 - disc)", 10000L)
          .as("v"))
        .orderBy("k").as[(String, Double)].collect().toSeq
      val want = df.groupBy("k")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr(
            "CAST(price * (1 - disc) AS DECIMAL(22,4))"))
          .cast("double").as("v"))
        .orderBy("k").as[(String, Double)].collect().toSeq
      assert(got == want, s"trial $t diverged")
    }
  }

  test("clamped-balance closed form equals the sequential recurrence") {
    import spark.implicits._
    // b_n = max(0, b_{n-1} + x_n) computed naively on the driver from
    // each user's ordered deltas must equal the windowed closed form
    // S_n - min(0, min S_j) the declared query uses
    val e = Tables.events(spark, sf)
      .filter(col("user_id") < 500)
      .select(col("user_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("t"),
        col("event_id"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long"))
          .otherwise(-round(col("value") * 100).cast("long")).as("delta"))
      .as[(Long, Long, Long, Long)].collect()
    val naive = e.groupBy(_._1).map { case (u, rows) =>
      var bal = 0L; var peak = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        bal = math.max(0L, bal + r._4); peak = math.max(peak, bal)
      }
      u -> ((bal, peak))
    }
    val declared = queries.WebAnalytics.runningBalance.fn(spark, sf)
      .select(col("user_id"),
        (col("final_balance") * 100).cast("long"),
        (col("peak_balance") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(naive.nonEmpty && naive.size == declared.size)
    naive.foreach { case (u, bp) =>
      assert(declared(u) == bp, s"user $u: naive $bp vs declared ${declared(u)}")
    }
  }

  test("TWA conservation: interval seconds exactly cover each user's observed span") {
    import spark.implicits._
    // every user's timeline is tiled by half-open intervals, so the
    // total weighted seconds must equal sum over users of
    // (last second - first second) — zero-dt same-second repeats
    // contribute nothing on either side
    val totalSecs = queries.WebAnalytics.timeWeightedAvg.fn(spark, sf)
      .agg(sum("total_secs")).as[Long].head()
    val spans = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("t"))
      .groupBy("user_id")
      .agg((max("t") - min("t")).as("span"))
      .agg(sum("span")).as[Long].head()
    assert(totalSecs == spans, s"intervals $totalSecs != spans $spans")
  }
}
