package graft

import org.apache.spark.sql.functions._

/** Independent correctness gates for the round-9 frontier/graph/
  * retrieval operators. The DuckDB oracles for q_skyline and
  * q_peak_concurrency replay the same (scalable) algorithm, so these
  * tests hold the NAIVE definitions — quadratic dominance, per-day
  * interval recount, unoriented triangle enumeration, plain-Scala
  * BM25 — against the declared results at sf0.001.
  */
class FrontierSpec extends SparkSpec {

  test("q_skyline equals the brute-force NOT-EXISTS dominance set") {
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_size", "p_retailprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val brute = parts.filter { case (_, sy, py) =>
      !parts.exists { case (_, sx, px) =>
        px <= py && sx >= sy && (px < py || sx > sy)
      }
    }.map(_._1).toSet
    val declared = SparkEntry.queries("q_skyline")(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(declared === brute)
  }

  test("q_peak_concurrency peaks match a per-day interval recount") {
    import java.time.LocalDate
    val iv = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date").as("sd"), col("o_orderkey"))
      .collect()
      .map { r =>
        val sd = r.getDate(0).toLocalDate
        (sd, sd.plusDays((r.getLong(1) % 90) + 1))
      }
    val lo = iv.map(_._1).min((a: LocalDate, b: LocalDate) => a.compareTo(b))
    val hi = iv.map(_._2).max((a: LocalDate, b: LocalDate) => a.compareTo(b))
    // concurrency at day d = intervals with sd <= d < ed, evaluated on
    // EVERY calendar day (not just event days) — the padding rows in
    // the declared query exist precisely so carried levels at month
    // starts are observable; this recount would catch their absence
    val days = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).toSeq
    val byMonth = days.groupBy(d => d.withDayOfMonth(1)).map { case (m, ds) =>
      m -> ds.map(d => iv.count { case (sd, ed) =>
        !sd.isAfter(d) && d.isBefore(ed)
      }).max
    }
    val declared = SparkEntry.queries("q_peak_concurrency")(spark, sf)
      .select("month", "peak_open").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    // recount covers months intersecting [lo, hi]; declared months are
    // exactly the event-day months — same set
    assert(declared.keySet === byMonth.keySet)
    byMonth.foreach { case (m, peak) =>
      assert(declared(m) === peak.toLong, s"month $m")
    }
  }

  test("q_triangle_count matches naive unoriented a<b<c enumeration") {
    val edges = graft.operators.GraphOps.supplierEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val eset = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val naive = for {
      a <- nodes; b <- nodes if a < b && eset((a, b))
      c <- nodes if b < c && eset((b, c)) && eset((a, c))
    } yield (a, b, c)
    val perNode = naive.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val declaredTris = graft.operators.GraphOps
      .triangles(graft.operators.GraphOps.supplierEdges(spark, sf))
      .collect().map(r => {
        val s = Seq(r.getLong(0), r.getLong(1), r.getLong(2)).sorted
        (s(0), s(1), s(2))
      })
    assert(declaredTris.length === naive.length)
    assert(declaredTris.toSet === naive.toSet)
    // and each triangle exactly once (no double-enumeration)
    assert(declaredTris.distinct.length === declaredTris.length)
    val declaredTop = SparkEntry.queries("q_triangle_count")(spark, sf)
      .select("s_suppkey", "n_tri").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    declaredTop.foreach { case (k, n) => assert(perNode(k) === n, s"supp $k") }
  }

  test("q_bfs_hops matches a plain-Scala queue BFS") {
    val edges = graft.operators.GraphOps.supplierEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val seed = edges.flatMap(e => Seq(e._1, e._2)).min
    // textbook level-order BFS, truncated at hop 4
    val hops = scala.collection.mutable.Map(seed -> 0L)
    var level = Seq(seed)
    for (k <- 1 to 4) {
      level = level.flatMap(v => adj.getOrElse(v, Nil))
        .distinct.filterNot(hops.contains)
      level.foreach(v => hops(v) = k.toLong)
    }
    val declared = SparkEntry.queries("q_bfs_hops")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(declared.toMap === hops.toMap)
    // ordering contract of the declared output
    assert(declared.map(_._1).toSeq === declared.map(_._1).sorted.toSeq)
  }

  test("q_bm25_topk matches a plain-Scala BM25 scorer") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val terms = graft.operators.Retrieval.QueryTerms
    val n = texts.length.toDouble
    val avgdl = texts.map(_._2.length.toDouble).sum / texts.length
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val idf = terms.map { t =>
      val df = texts.count(_._2.contains(t)).toDouble
      t -> q9(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
    }.toMap
    val scored = texts.flatMap { case (id, ws) =>
      val dl = ws.length.toDouble
      val cs = terms.flatMap { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) None
        else Some(q9(idf(t).toDouble *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))))
      }
      if (cs.isEmpty) None else Some((id, cs.size.toLong, cs.sum.toDouble))
    }
    val expected = scored.sortBy { case (id, _, s) => (-s, id) }.take(25)
    val declared = SparkEntry.queries("q_bm25_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(declared.toSeq === expected.toSeq)
  }

  test("q_hybrid_rrf fuses the two independent rankings correctly") {
    // recompute the fusion from the DECLARED legs: ranks must agree
    // with a standalone BM25 / dense ranking, every fused row carries
    // at least one rank, and rrf = round(Σ 1/(60+r), 9) exactly
    val rows = SparkEntry.queries("q_hybrid_rrf")(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 25)
    // independent lexical ranking from the gated BM25 query's order
    val lex = graft.operators.Retrieval.bm25Scores(spark, sf)
      .orderBy(col("score").desc, col("doc_id"))
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    // independent dense ranking (brute force vs vec 0)
    val emb = Tables.embeddings(spark, sf)
    val q0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val den = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        var s = 0.0; var i = 0
        while (i < v.length) { s += q0(i).toDouble * v(i).toDouble; i += 1 }
        (r.getLong(0), s)
      }
      .sortBy { case (id, dot) => (-dot, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    var prevRrf = Double.MaxValue
    rows.foreach { r =>
      val id = r.getLong(0)
      val rl = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rd = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(rl.isDefined || rd.isDefined, s"doc $id fused with no rank")
      rl.foreach(v => assert(lex.get(id).contains(v), s"doc $id lex rank"))
      rd.foreach(v => assert(den.get(id).contains(v), s"doc $id dense rank"))
      val expect = BigDecimal(
        rl.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
          rd.map(v => 1.0 / (60 + v)).getOrElse(0.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expect, s"doc $id rrf")
      assert(r.getDouble(3) <= prevRrf, "output not rrf-descending")
      prevRrf = r.getDouble(3)
    }
    // a doc ranked high in BOTH lists must out-fuse a doc in one list:
    // the head row carries two ranks on this fixture (ids align)
    assert(!rows.head.isNullAt(1) || !rows.head.isNullAt(2))
  }
}
