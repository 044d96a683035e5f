package graft

import graft.operators.AsOf
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native as-of join (AsOfJoinPlan/AsOfJoinExec): physical shape,
  * equivalence with the union+window form, and the null contract.
  */
class AsOfJoinSpec extends SparkSpec {

  test("native as-of join matches the union+window as-of exactly") {
    val native = SparkEntry.queries("q_asof_native")(spark, sf)
    val legacy = SparkEntry.queries("q_asof_join")(spark, sf)
    assert(native.count() > 0)
    assert(native.exceptAll(legacy).count() == 0)
    assert(legacy.exceptAll(native).count() == 0)
  }

  test("native as-of join plans one exchange + sort per side, no pair blow-up") {
    val p = SparkEntry.queries("q_asof_native")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // a small bounded number of exchanges: one per join side, one
    // inside the clicks (user_id, sec) pre-aggregation, one for the
    // final ORDER BY — and in particular no expand-then-aggregate
    // blow-up like Spark's built-in RewriteAsOfJoin would produce
    // (a pair-materializing plan shows up as extra exchanges plus an
    // Expand/Window; bound rather than pin, so planner-version noise
    // doesn't false-fail)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges >= 3 && exchanges <= 5, s"$exchanges exchanges:\n$p")
    assert(!p.contains("Expand"), p)
  }

  test("downstream groupBy on the join key reuses the as-of join's exchange") {
    import graft.operators.AsOf
    import spark.implicits._
    val left = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 10L, 3.0))
      .toDF("lk", "lt", "lv")
    val right = Seq((1L, 5L, 100L), (2L, 5L, 200L))
      .toDF("rk", "rt", "rpayload")
    val joined = AsOf.join(left, right,
      Seq(left("lk")), Seq(right("rk")), left("lt"), right("rt"))
    val plainExchanges = "Exchange".r
      .findAllIn(joined.queryExecution.executedPlan.toString).size
    val grouped = joined.groupBy("lk").count()
    val groupedExchanges = "Exchange".r
      .findAllIn(grouped.queryExecution.executedPlan.toString).size
    // outputPartitioning advertises the children's hash partitioning,
    // so the same-key aggregate must NOT add a shuffle (partial+final
    // collapse onto the join's own exchanges)
    assert(groupedExchanges == plainExchanges,
      s"groupBy added ${groupedExchanges - plainExchanges} exchange(s):\n" +
        grouped.queryExecution.executedPlan)
  }

  test("Spark's own joinAsOf API routes to the native merge exec (RewriteSparkAsOfJoin)") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l_a"), (1L, 3L, "l_early"), (2L, 10L, "l_nofuture"))
      .toDF("lk", "lt", "ltag")
    val right = Seq((1L, 5L, "r_old"), (1L, 9L, "r_new"), (2L, 11L, "r_future"))
      .toDF("rk", "rt", "rtag")
    val joined = org.apache.spark.sql.GraftSqlBridge.joinAsOf(
      left, right, left("lt"), right("rt"), left("lk") === right("rk"), "inner")
    val p = joined.queryExecution.executedPlan.toString
    // the injected post-hoc rule replaced Spark's AsOfJoin (which the
    // optimizer would expand into join + min_by aggregate) with the
    // merge exec — the physical plan carries AsOfJoin and no aggregate
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"), p)
    val got = joined.select("ltag", "rtag").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("l_a", "r_new")), got)

    // shapes the merge exec does NOT implement still work via Spark's
    // own rewrite: left-outer keeps unmatched left rows
    val outer = org.apache.spark.sql.GraftSqlBridge.joinAsOf(
      left, right, left("lt"), right("rt"), left("lk") === right("rk"), "left")
    // untouched by the rule -> Spark's pair-expand + min_by aggregate
    assert(outer.queryExecution.executedPlan.toString.contains("Aggregate"),
      outer.queryExecution.executedPlan.toString)
    assert(outer.count() == 3, "left outer keeps all left rows")
  }

  test("direct collect/sort/distinct over the join emit UnsafeRows " +
      "(no ProjectExec shielding the exec's output)") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (2L, 7L, "b")).toDF("lk", "lt", "ltag")
    val right = Seq((1L, 9L, "x"), (2L, 5L, "y")).toDF("rk", "rt", "rtag")
    def joined() = org.apache.spark.sql.GraftSqlBridge.joinAsOf(
      left, right, left("lt"), right("rt"), left("lk") === right("rk"), "inner")
    // round-15 review: the exec emitted raw JoinedRows, and every
    // consumer that serializes/sorts/collects casts to UnsafeRow —
    // every prior spec happened to .select(...) first, inserting the
    // ProjectExec that masked it. These three shapes consume the
    // exec's rows DIRECTLY.
    assert(joined().collect().length == 2)
    assert(joined().orderBy(col("lt")).collect().length == 2)
    assert(joined().distinct().count() == 2)
  }

  test("nearest without a distance expression fails at construction, " +
      "not mid-task") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinPlan(
        df.queryExecution.analyzed, df.queryExecution.analyzed,
        Seq.empty, Seq.empty,
        df.queryExecution.analyzed.output(1),
        df.queryExecution.analyzed.output(1),
        direction = "nearest")
    }
  }

  test("joinAsOf full matrix: every direction x exact x tolerance routes native and matches") {
    import spark.implicits._
    // hand-built fixture: multi-key, boundary ties, keys missing on
    // each side, NULL key and NULL time rows; nearest distances are
    // tie-free by construction (Spark leaves equidistant ties
    // unspecified, so parity on them is not defined)
    val left = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L), "a10"),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(11L), "a11"),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(20L), "a20"),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(5L), "b5"),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(6L), "b6"),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(100L), "c100"),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(10L), "nullkey"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "nulltime"))
      .toDF("lk", "lt", "ltag")
    val right = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(1L), "r1"),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L), "r10"),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(14L), "r14"),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(6L), "r6"),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(40L), "r40"),
      (java.lang.Long.valueOf(4L), java.lang.Long.valueOf(7L), "r7"),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(2L), "rnullkey"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "rnulltime"))
      .toDF("rk", "rt", "rtag")
    val lRows = Seq((1L, 10L, "a10"), (1L, 11L, "a11"), (1L, 20L, "a20"),
      (2L, 5L, "b5"), (2L, 6L, "b6"), (3L, 100L, "c100"))
    val rRows = Seq((1L, 1L, "r1"), (1L, 10L, "r10"), (1L, 14L, "r14"),
      (2L, 6L, "r6"), (2L, 40L, "r40"), (4L, 7L, "r7"))

    // independent driver-side reference of the API contract (strict
    // tolerance bounds when allowExactMatches is off — probed from
    // Spark's own condition construction)
    def reference(dir: String, exact: Boolean, tol: Option[Long]) =
      lRows.flatMap { case (lk, lt, ltag) =>
        val inRange = rRows.filter(_._1 == lk).filter { case (_, rt, _) =>
          val base = dir match {
            case "backward" => if (exact) rt <= lt else rt < lt
            case "forward" => if (exact) rt >= lt else rt > lt
            case _ => if (exact) true else rt != lt
          }
          val window = tol.forall { d =>
            dir match {
              case "backward" => if (exact) rt >= lt - d else rt > lt - d
              case "forward" => if (exact) rt <= lt + d else rt < lt + d
              case _ => if (exact) rt >= lt - d && rt <= lt + d
                        else rt > lt - d && rt < lt + d
            }
          }
          base && window
        }
        val pick = dir match {
          case "backward" => inRange.sortBy(_._2).lastOption
          case "forward" => inRange.sortBy(_._2).headOption
          case _ => inRange.sortBy(r => math.abs(r._2 - lt)).headOption
        }
        pick.map(r => (ltag, r._3))
      }.toSet

    for (dir <- Seq("backward", "forward", "nearest");
         exact <- Seq(true, false);
         tol <- Seq(None, Some(5L))) {
      val joined = org.apache.spark.sql.GraftSqlBridge.joinAsOf(
        left, right, left("lt"), right("rt"), left("lk") === right("rk"),
        "inner", tol.map(d => org.apache.spark.sql.functions.lit(d)).orNull,
        exact, dir)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("AsOfJoin") && !p.contains("HashAggregate") &&
        !p.contains("SortAggregate"),
        s"dir=$dir exact=$exact tol=$tol must route to the merge exec:\n$p")
      val got = joined.select("ltag", "rtag").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val want = reference(dir, exact, tol)
      assert(got == want,
        s"dir=$dir exact=$exact tol=$tol: got=$got want=$want")
    }
  }

  test("randomized full matrix: 12 direction/exact/tolerance combos on 800 rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // single long key, coarse times → heavy per-key duplication, left
    // time ties, keys missing on either side; right (key, time) unique
    // so the backward/forward pick is payload-deterministic. Nearest
    // equidistant ties DO occur here — the reference mirrors the
    // exec's documented backward tie-break (the API leaves it
    // unspecified, so pinning our own contract is the point).
    val lRows = Seq.fill(800)((rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, rnd.nextLong()))
    val rRows = Seq.fill(600)((rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, rnd.nextLong()))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val left = lRows.toDF("lk", "lt", "lpay")
    val right = rRows.toDF("rk", "rt", "rpay")
    def reference(dir: String, exact: Boolean, tol: Option[Long]) =
      lRows.flatMap { case (lk, lt, lpay) =>
        val inRange = rRows.filter(_._1 == lk).filter { case (_, rt, _) =>
          val base = dir match {
            case "backward" => if (exact) rt <= lt else rt < lt
            case "forward" => if (exact) rt >= lt else rt > lt
            case _ => if (exact) true else rt != lt
          }
          val window = tol.forall { d =>
            dir match {
              case "backward" => if (exact) rt >= lt - d else rt > lt - d
              case "forward" => if (exact) rt <= lt + d else rt < lt + d
              case _ => if (exact) rt >= lt - d && rt <= lt + d
                        else rt > lt - d && rt < lt + d
            }
          }
          base && window
        }
        val pick = dir match {
          case "backward" => inRange.sortBy(_._2).lastOption
          case "forward" => inRange.sortBy(_._2).headOption
          // (|Δt|, rt asc) → equidistant tie prefers the smaller rt =
          // the backward candidate, matching the exec's contract
          case _ => inRange.sortBy(r => (math.abs(r._2 - lt), r._2)).headOption
        }
        pick.map(r => (lpay, r._3))
      }.groupBy(identity).view.mapValues(_.size).toMap
    for (dir <- Seq("backward", "forward", "nearest");
         exact <- Seq(true, false);
         tol <- Seq(None, Some(7L))) {
      val joined = org.apache.spark.sql.GraftSqlBridge.joinAsOf(
        left, right, left("lt"), right("rt"), left("lk") === right("rk"),
        "inner", tol.map(d => org.apache.spark.sql.functions.lit(d)).orNull,
        exact, dir)
      assert(joined.queryExecution.executedPlan.toString.contains("AsOfJoin"),
        s"dir=$dir exact=$exact tol=$tol must route native")
      val got = joined.select("lpay", "rpay").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val want = reference(dir, exact, tol)
      assert(got == want, {
        val g = got.toSet; val w = want.toSet
        s"dir=$dir exact=$exact tol=$tol missing=${(w -- g).take(3)} extra=${(g -- w).take(3)}"
      })
    }
  }

  test("timestamp- and date-typed as-of columns route native (ResolveBinaryArithmetic forms)") {
    // AsOfJoin.apply builds a raw Subtract order expression, but the
    // analyzer rewrites it by operand type before RewriteSparkAsOfJoin
    // runs: timestamp - timestamp -> SubtractTimestamps, date - date ->
    // DateDiff/SubtractDates. Matching only raw Subtract silently sent
    // every timestamp as-of join — the most common shape — to Spark's
    // pair-expand + min_by rewrite (round-5 advice). This pins the
    // resolved forms for every direction.
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq((1L, ts(100), "a100"), (1L, ts(205), "a205"), (2L, ts(50), "b50"))
      .toDF("lk", "lt", "ltag")
    val right = Seq((1L, ts(90), "r90"), (1L, ts(200), "r200"), (2L, ts(60), "r60"))
      .toDF("rk", "rt", "rtag")
    val expect = Map(
      "backward" -> Set(("a100", "r90"), ("a205", "r200")),
      "forward" -> Set(("a100", "r200"), ("b50", "r60")), // a205: nothing at/after
      "nearest" -> Set(("a100", "r90"), ("a205", "r200"), ("b50", "r60")))
    for (dir <- Seq("backward", "forward", "nearest")) {
      val j = org.apache.spark.sql.GraftSqlBridge.joinAsOf(
        left, right, left("lt"), right("rt"), left("lk") === right("rk"),
        "inner", null, true, dir)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("AsOfJoin") && !p.contains("HashAggregate") &&
        !p.contains("SortAggregate"),
        s"timestamp as-of dir=$dir must route to the merge exec:\n$p")
      val got = j.select("ltag", "rtag").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == expect(dir), s"dir=$dir: $got")
    }
    // timestamp + tolerance: the as-of condition now carries interval
    // arithmetic (timestamp-typed bounds) — it travels whole as the
    // exec's emit predicate, and the API's tolerance>=0 assertion must
    // still fold. 60s window: a100 keeps r90 (10s back), a205 keeps
    // r200, b50 drops r60 under backward but keeps it under nearest.
    for ((dir, want) <- Seq(
        "backward" -> Set(("a100", "r90"), ("a205", "r200")),
        "nearest" -> Set(("a100", "r90"), ("a205", "r200"), ("b50", "r60")))) {
      val jt = org.apache.spark.sql.GraftSqlBridge.joinAsOf(
        left, right, left("lt"), right("rt"), left("lk") === right("rk"),
        "inner", org.apache.spark.sql.functions.expr("INTERVAL '60' SECOND"),
        true, dir)
      val pt = jt.queryExecution.executedPlan.toString
      assert(pt.contains("AsOfJoin") && !pt.contains("HashAggregate") &&
        !pt.contains("SortAggregate"),
        s"timestamp as-of with tolerance dir=$dir must route native:\n$pt")
      val gt = jt.select("ltag", "rtag").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(gt == want, s"tolerance dir=$dir: $gt")
    }

    // DateType: backward direction through the DateDiff/SubtractDates form
    def dt(d: Int) = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong))
    val dl = Seq((1L, dt(100), "d100"), (1L, dt(205), "d205")).toDF("lk", "lt", "ltag")
    val dr = Seq((1L, dt(90), "e90"), (1L, dt(200), "e200")).toDF("rk", "rt", "rtag")
    val dj = org.apache.spark.sql.GraftSqlBridge.joinAsOf(
      dl, dr, dl("lt"), dr("rt"), dl("lk") === dr("rk"), "inner", null, true, "backward")
    val dp = dj.queryExecution.executedPlan.toString
    assert(dp.contains("AsOfJoin") && !dp.contains("HashAggregate") &&
      !dp.contains("SortAggregate"), s"date as-of must route native:\n$dp")
    val dgot = dj.select("ltag", "rtag").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(dgot == Set(("d100", "e90"), ("d205", "e200")), dgot.toString)
  }

  test("randomized: native exec equals the window-form reference on 2k rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Dense COMPOSITE keys + coarse times force heavy per-key
    // duplication, time ties, keys missing on either side, and
    // multi-partition merges through the two-column key path.
    val left = Seq.fill(2000)((rnd.nextInt(8).toLong, rnd.nextInt(5),
      rnd.nextInt(50).toLong, rnd.nextLong()))
      .toDF("lk1", "lk2", "lt", "lpayload")
    val right = Seq.fill(1500)((rnd.nextInt(8).toLong, rnd.nextInt(5),
      rnd.nextInt(50).toLong, rnd.nextLong())).toDF("k1", "k2", "t", "rpayload")
      // unique (key, time) on the right: as-of picks the row with max
      // time <= lt; at equal times the match must be deterministic
      .groupBy("k1", "k2", "t").agg(max("rpayload").as("rpayload"))
      .select(col("k1").as("rk1"), col("k2").as("rk2"), col("t").as("rt"),
        col("rpayload"))
    val native = AsOf.join(left, right,
        leftKeys = Seq(left("lk1"), left("lk2")),
        rightKeys = Seq(right("rk1"), right("rk2")),
        leftTime = left("lt"), rightTime = right("rt"))
      .select("lk1", "lk2", "lt", "lpayload", "rt", "rpayload")
    // reference: window form — per left row, latest right at-or-before
    val ref = left.join(right, left("lk1") === right("rk1") &&
        left("lk2") === right("rk2") && right("rt") <= left("lt"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lk1", "lk2", "lt", "lpayload").orderBy(col("rt").desc)))
      .filter(col("rn") === 1)
      .select("lk1", "lk2", "lt", "lpayload", "rt", "rpayload")
    assert(native.count() == ref.count())
    assert(native.exceptAll(ref).count() == 0 && ref.exceptAll(native).count() == 0)
  }

  test("native as-of composes with streaming via foreachBatch enrichment") {
    // The reference's enrichment shape: a stream of facts joined
    // as-of against a static dimension snapshot, per micro-batch.
    // foreachBatch hands us a BATCH DataFrame, so the custom batch
    // operator drops straight in — no streaming-specific code path.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, 10L, "v1"), (1L, 20L, "v2"), (2L, 5L, "w1"))
      .toDF("rk", "rt", "tag")
    val stream = MemoryStream[(Long, Long)]
    stream.addData((1L, 15L), (1L, 25L), (2L, 6L), (3L, 9L))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = stream.toDS().toDF("lk", "lt").writeStream
      .outputMode("append")
      .option("checkpointLocation", SparkEnv.scratchDir("asof-stream"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val enriched = AsOf.join(batch, dim,
          leftKeys = Seq(batch("lk")), rightKeys = Seq(dim("rk")),
          leftTime = batch("lt"), rightTime = dim("rt"))
        collected ++= enriched.select("lk", "lt", "tag").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // (2,6) matches w1 (rt=5 <= 6); (3,9) has no dim key -> dropped
    assert(collected.sorted.toList == List(
      (1L, 15L, "v1"), (1L, 25L, "v2"), (2L, 6L, "w1")).sorted, collected)
  }

  test("null keys and null times never match; ties resolve to latest row") {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("t", LongType, nullable = true),
      StructField("tag", StringType, nullable = false)))
    def df(rows: Seq[(java.lang.Long, java.lang.Long, String)], prefix: String) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2),
        schema)
        .select(col("k").as(s"${prefix}k"), col("t").as(s"${prefix}t"),
          col("tag").as(s"${prefix}tag"))
    val left = df(Seq(
      (1L, 10L, "l_a"),            // matches r at t=9 (latest <= 10)
      (1L, 3L, "l_early"),         // no right row <= 3
      (2L, 10L, "l_nullside"),     // only right rows for k=2 have null t
      (null, 10L, "l_nullkey"),    // null key: never matches
      (3L, null, "l_nulltime"),    // null time: never matches
      (4L, 10L, "l_d")), "l")      // exact-time tie: t=10 matches
    val right = df(Seq(
      (1L, 5L, "r_old"), (1L, 9L, "r_new"), (1L, 11L, "r_future"),
      (2L, null, "r_nulltime"),
      (null, 1L, "r_nullkey"),
      (4L, 10L, "r_exact")), "r")
    val out = AsOf.join(left, right,
        leftKeys = Seq(left("lk")), rightKeys = Seq(right("rk")),
        leftTime = left("lt"), rightTime = right("rt"))
      .select("ltag", "rtag").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(out == Set(("l_a", "r_new"), ("l_d", "r_exact")), out)
  }
}
