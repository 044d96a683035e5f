package graft

import graft.operators.Hnsw
import org.apache.spark.sql.functions._

/** The round-12 HNSW shard-graph index (K3's graph-based serving
  * structure): seedless-deterministic construction, bounded degrees,
  * build-once caching, and the scatter-gather search contract.
  * Recall vs the exact twin is measured and persisted by AnnRecallSpec
  * (ANN_RECALL.md) like every other ANN variant.
  */
class HnswSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("hnsw build is deterministic and partitioning-invariant") {
    val a = Hnsw.buildShardGraphs(emb)
      .orderBy("shard", "vec_id").collect().map(_.toString)
    val b = Hnsw.buildShardGraphs(emb.repartition(13))
      .orderBy("shard", "vec_id").collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b),
      "adjacency must be identical across input partitionings")
  }

  test("hnsw degrees are bounded by M (2M at level 0) and levels by the hash") {
    val rows = Hnsw.buildShardGraphs(emb)
      .select(col("vec_id"), col("level"), col("nbrs")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0); val level = r.getInt(1)
      val nbrs = r.getSeq[scala.collection.Seq[Long]](2)
      assert(level == Hnsw.levelOf(id), s"level must derive from the id hash: $id")
      assert(nbrs.length == level + 1, s"one adjacency list per level: $id")
      nbrs.zipWithIndex.foreach { case (l, lvl) =>
        val cap = if (lvl == 0) 2 * Hnsw.M else Hnsw.M
        assert(l.length <= cap, s"degree ${l.length} > $cap at level $lvl (vec $id)")
        assert(!l.contains(id), s"no self-edges: $id")
      }
    }
  }

  test("hnsw adjacency stays within the shard (shard-local graphs)") {
    val rows = Hnsw.buildShardGraphs(emb, shards = 4)
      .select(col("shard"), col("nbrs")).collect()
    rows.foreach { r =>
      val shard = r.getInt(0)
      r.getSeq[scala.collection.Seq[Long]](1).flatten.foreach { n =>
        assert((n % 4).toInt == shard, s"neighbor $n escaped shard $shard")
      }
    }
  }

  test("hnsw cached index equals a fresh build and serves the probe shape") {
    val path = Hnsw.cachedHnswIndex(spark, emb, sf)
    val path2 = Hnsw.cachedHnswIndex(spark, emb, sf)
    assert(path == path2, "second lookup must hit the cache")
    val cached = spark.read.parquet(path)
      .orderBy("shard", "vec_id").collect().map(_.toString)
    // parquet round-trip reorders columns (partition col last) — compare
    // on the same read-back projection
    val fresh = Hnsw.buildShardGraphs(emb)
    val freshPath = SparkEnv.scratchDir("hnsw-fresh")
    fresh.write.mode("overwrite").partitionBy("shard").parquet(freshPath)
    val fresh2 = spark.read.parquet(freshPath)
      .orderBy("shard", "vec_id").collect().map(_.toString)
    assert(cached.sameElements(fresh2))
    val res = Hnsw.annHnsw(spark.read.parquet(path), emb.filter(col("vec_id") < 5))
    val rows = res.collect()
    assert(rows.nonEmpty)
    // contract: k rows per query, ranked by cos_sim desc, no self-hits
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(!rs.exists(_.getLong(1) == q), "self-hit")
      val sims = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.sameElements(sims.sortBy(-(_: Double))), "ranked desc")
    }
  }

  test("hnsw handles the empty corpus (no index, no rows, no throw)") {
    val empty = emb.filter(lit(false))
    val res = Hnsw.annHnsw(Hnsw.buildShardGraphs(empty), empty)
    assert(res.collect().isEmpty)
  }

  private def adjacency(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.orderBy("shard", "vec_id").collect().map(_.toString)

  test("upsert law, append regime: insert-then-search ≡ rebuild-then-search " +
      "(byte-identical adjacency, only owning shards touched)") {
    val ids = emb.select(max("vec_id")).head.getLong(0)
    val cut = ids - ids / 5 // last ~20% of ids arrive later
    val old = emb.filter(col("vec_id") <= cut)
    val late = emb.filter(col("vec_id") > cut)
    assert(!late.isEmpty, "fixture must leave a non-empty tail")
    val touched = spark.sparkContext.collectionAccumulator[Int]("touchedShards")
    val upserted = Hnsw.upsertHnsw(
      Hnsw.buildShardGraphs(old), late, touchedShards = Some(touched))
    // every new id exceeds every old id, so each touched shard takes
    // the append fast path (reconstruct + continue insertion) and the
    // result must equal building the merged corpus from scratch,
    // byte-for-byte — the law that makes incremental ingest safe
    assert(adjacency(upserted).sameElements(adjacency(Hnsw.buildShardGraphs(emb))))
    import scala.jdk.CollectionConverters._
    val touchedSet = touched.value.asScala.toSet
    assert(touchedSet.nonEmpty && touchedSet.subsetOf(
      (0 until Hnsw.NumShards).toSet))
  }

  test("upsert law, rebuild regime: out-of-order and replacing ids still " +
      "equal the full rebuild (new vector wins an id collision)") {
    // interleaved: multiples of 3 arrive late. gcd(3, NumShards=4) = 1,
    // so EVERY shard holds a non-empty old graph AND interleaved new
    // ids — the populated-old out-of-order rebuild (a pmod-2 split
    // would route all news into empty-old shards and never exercise
    // the old+new merge; round-13 review)
    val firsts = emb.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val late = emb.filter(pmod(col("vec_id"), lit(3)) === 0)
    val up1 = Hnsw.upsertHnsw(Hnsw.buildShardGraphs(firsts), late)
    assert(adjacency(up1).sameElements(adjacency(Hnsw.buildShardGraphs(emb))))
    // replace: re-upsert vec_id 0 with a different vector; result must
    // equal a fresh build over the corpus carrying the replacement
    val replaced = emb.withColumn("embedding",
      when(col("vec_id") === 0,
        expr("transform(embedding, x -> CAST(-x AS FLOAT))"))
        .otherwise(col("embedding")))
    val up2 = Hnsw.upsertHnsw(
      Hnsw.buildShardGraphs(emb), replaced.filter(col("vec_id") === 0))
    assert(adjacency(up2).sameElements(adjacency(Hnsw.buildShardGraphs(replaced))))
  }

  test("upsert duplicate-id contract: exact duplicates collapse, " +
      "conflicting vectors fail loudly") {
    val ids = emb.select(max("vec_id")).head.getLong(0)
    val old = emb.filter(col("vec_id") <= ids - 40)
    val late = emb.filter(col("vec_id") > ids - 40)
    val doubled = late.unionAll(late) // exact duplicates: collapse
    val up = Hnsw.upsertHnsw(Hnsw.buildShardGraphs(old), doubled)
    assert(adjacency(up).sameElements(adjacency(Hnsw.buildShardGraphs(emb))))
    val conflicted = late.unionAll(late.withColumn("embedding",
      expr("transform(embedding, x -> CAST(-x AS FLOAT))")))
    val err = intercept[org.apache.spark.SparkException] {
      Hnsw.upsertHnsw(Hnsw.buildShardGraphs(old), conflicted)
        .queryExecution.toRdd.count()
    }
    assert(err.getMessage.contains("conflicting vectors") ||
      Option(err.getCause).exists(_.getMessage.contains("conflicting vectors")))
  }

  test("split law: splitShard(build(4), s) ≡ build(8) on the two halves, " +
      "pass-through elsewhere, search invariant, routeShard routes the mix") {
    val base = Hnsw.buildShardGraphs(emb, shards = 4)
    val split = Hnsw.splitShard(base, shard = 2, shards = 4)
    // the two halves are byte-identical to a FULL 8-shard build's
    // shards {2, 6} — pmod nesting makes the split exact
    val full8 = Hnsw.buildShardGraphs(emb, shards = 8)
    val halves = Set(2, 6)
    assert(adjacency(split.filter(col("shard").isin(halves.toSeq: _*)))
      .sameElements(adjacency(full8.filter(col("shard").isin(halves.toSeq: _*)))),
      "split halves must equal the 2x-modulus build byte-for-byte")
    // every other shard passes through the split untouched
    assert(adjacency(split.filter(!col("shard").isin(halves.toSeq: _*)))
      .sameElements(adjacency(base.filter(col("shard") =!= 2))),
      "non-split shards must pass through unchanged")
    // scatter-gather search is invariant under the re-sharding
    val qs = emb.filter(col("vec_id") < 5)
    val a = Hnsw.annHnsw(base, qs).orderBy("q_id", "rn")
      .collect().map(_.toString)
    val b = Hnsw.annHnsw(split, qs).orderBy("q_id", "rn")
      .collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b),
      "search results must not change across a shard split")
    // the realized shard-id set after splitting 2 at base modulus 4
    val shardIds = split.select("shard").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(shardIds == Set(0, 1, 2, 3, 6), s"unexpected shard-id set $shardIds")
    // routing under mixed moduli takes the SPLIT REGISTRY (explicit
    // metadata), not the observed shard ids — a split whose upper half
    // is empty would otherwise be indistinguishable from "never split"
    for (id <- 0L to 40L) {
      val expect = if (id % 4 == 2) (id % 8).toInt else (id % 4).toInt
      assert(Hnsw.routeShard(id, splitBases = Set(2), shards = 4) == expect,
        s"id $id routed to ${Hnsw.routeShard(id, Set(2), 4)}, want $expect")
    }
    // unsplit registry: everything routes at the base modulus
    for (id <- 0L to 12L)
      assert(Hnsw.routeShard(id, Set.empty, 4) == (id % 4).toInt)
    // splitting a split half is a contract violation, loudly
    intercept[IllegalArgumentException](Hnsw.splitShard(split, 6, 4))
  }

  test("delete law: deleteFromHnsw(build(C), D) ≡ build(C \\ D), " +
      "byte-identical adjacency (the GDPR purge leg)") {
    val del = emb.filter(Hnsw.purgedPredicate)
    assert(!del.isEmpty, "gated purge set must be non-vacuous")
    assert(del.filter(col("vec_id") < 5).isEmpty,
      "gated purge set must be disjoint from the probe ids")
    val deleted = Hnsw.deleteFromHnsw(
      Hnsw.buildShardGraphs(emb), del.select("vec_id"))
    val survivors = emb.filter(!Hnsw.purgedPredicate)
    assert(adjacency(deleted)
      .sameElements(adjacency(Hnsw.buildShardGraphs(survivors))),
      "delete must equal the from-scratch build over survivors")
    // no purged id survives as a node OR inside any adjacency list
    val purgedIds = del.select("vec_id").collect().map(_.getLong(0)).toSet
    val rows = deleted.select(col("vec_id"), col("nbrs")).collect()
    rows.foreach { r =>
      assert(!purgedIds.contains(r.getLong(0)), "purged node survived")
      r.getSeq[scala.collection.Seq[Long]](1).flatten.foreach(n =>
        assert(!purgedIds.contains(n), s"purged id $n survived in an adjacency list"))
    }
  }

  test("delete touches only owning shards; unindexed ids touch nothing; " +
      "a fully-purged shard vanishes") {
    val base = Hnsw.buildShardGraphs(emb)
    // one id in shard 2 (6 % 4): only that shard rebuilds
    val touched = spark.sparkContext.collectionAccumulator[Int]("delTouched")
    Hnsw.deleteFromHnsw(base, emb.filter(col("vec_id") === 6).select("vec_id"),
      touchedShards = Some(touched)).queryExecution.toRdd.count()
    import scala.jdk.CollectionConverters._
    assert(touched.value.asScala.toSet == Set(2),
      s"only shard 2 owns vec_id 6, but ${touched.value} did graph work")
    // an id that was never indexed: pure pass-through, zero graph work
    val maxId = emb.select(max("vec_id")).head.getLong(0)
    val ghost = spark.range(1).select(lit(maxId + 1000).as("vec_id"))
    assert(adjacency(Hnsw.deleteFromHnsw(base, ghost))
      .sameElements(adjacency(base)))
    // purge EVERY id of shard 1: the shard leaves the index entirely
    val wholeShard = emb.filter(pmod(col("vec_id"), lit(Hnsw.NumShards)) === 1)
    val after = Hnsw.deleteFromHnsw(base, wholeShard.select("vec_id"))
    assert(after.select("shard").distinct().collect().map(_.getInt(0)).toSet
      == Set(0, 2, 3), "fully-purged shard must vanish")
    assert(adjacency(after)
      .sameElements(adjacency(base.filter(col("shard") =!= 1))))
  }

  test("purge composition: ONE purge set drives the index delete AND the " +
      "rollup retraction, and purged ids are unsearchable") {
    val purgeIds = emb.filter(Hnsw.purgedPredicate).select("vec_id")
    val purgedSet = purgeIds.collect().map(_.getLong(0)).toSet
    // index leg: search over the purged index returns no purged id
    val purgedIdx = Hnsw.deleteFromHnsw(Hnsw.buildShardGraphs(emb), purgeIds)
    val hits = Hnsw.annHnsw(purgedIdx, emb.filter(col("vec_id") < 5))
      .select("vec_id").collect().map(_.getLong(0))
    assert(hits.nonEmpty && hits.forall(!purgedSet.contains(_)),
      "a purged embedding must never appear in search results")
    // rollup leg: the q_incremental_user_purge delta algebra applied to
    // the SAME set — per-label counts retracted by the purge delta must
    // equal the recompute over survivors (incremental ≡ batch)
    val pre = emb.groupBy(col("label"), Hnsw.purgedPredicate.as("purged"))
      .agg(count(lit(1)).as("n"))
    val vOld = pre.groupBy("label").agg(sum("n").as("n"))
    val dV = pre.filter(col("purged"))
      .select(col("label"), (-col("n")).as("dn"))
    val merged = vOld.join(dV, Seq("label"), "left")
      .select(col("label"), (col("n") + coalesce(col("dn"), lit(0L))).as("n"))
      .filter(col("n") > 0)
    val recompute = emb.filter(!Hnsw.purgedPredicate)
      .groupBy("label").agg(count(lit(1)).as("n"))
    assert(merged.orderBy("label").collect().map(_.toString)
      .sameElements(recompute.orderBy("label").collect().map(_.toString)),
      "rollup purge from the same set must equal the survivor recompute")
  }

  test("upsert honors splitBases: the law holds on a split index, " +
      "columnar routing ≡ routeShard, stale registry fails loudly") {
    val ids = emb.select(max("vec_id")).head.getLong(0)
    val cut = ids - ids / 5
    val old = emb.filter(col("vec_id") <= cut)
    val late = emb.filter(col("vec_id") > cut)
    val splitOld = Hnsw.splitShard(Hnsw.buildShardGraphs(old, 4), 2, 4)
    val up = Hnsw.upsertHnsw(splitOld, late, shards = 4, splitBases = Set(2))
    // law under mixed moduli: upsert-into-split ≡ split-of-full-build
    val expect = Hnsw.splitShard(Hnsw.buildShardGraphs(emb, 4), 2, 4)
    assert(adjacency(up).sameElements(adjacency(expect)),
      "upsert into a split index must equal splitting the full rebuild")
    // routeShardCol is routeShard, columnar
    val routed = spark.range(41)
      .select(col("id"), Hnsw.routeShardCol(col("id"), Set(2), 4).as("r"))
      .collect()
    routed.foreach(r => assert(r.getInt(1) ==
      Hnsw.routeShard(r.getLong(0), Set(2), 4)))
    // a registry missing a realized split is stale metadata — loud
    intercept[IllegalArgumentException](Hnsw.upsertHnsw(splitOld, late))
  }

  test("upsert leaves unowned shards untouched (pass-through, no graph work)") {
    val ids = emb.select(max("vec_id")).head.getLong(0)
    // tail ids all landing in ONE shard: ids > cut with pmod == 2
    val old = emb.filter(col("vec_id") <= ids - 40)
    val late = emb.filter(col("vec_id") > ids - 40 &&
      pmod(col("vec_id"), lit(Hnsw.NumShards)) === 2)
    assert(!late.isEmpty)
    val touched = spark.sparkContext.collectionAccumulator[Int]("touchedShards")
    val up = Hnsw.upsertHnsw(Hnsw.buildShardGraphs(old), late,
      touchedShards = Some(touched))
    up.queryExecution.toRdd.count() // force execution
    // a SET of shard ids is retry-proof (re-added ids dedupe) AND
    // exact, so the pass-through claim is pinned precisely: shard 2
    // and ONLY shard 2 did graph work (round-14 review — the earlier
    // count-based relaxation could not catch an all-shards regression)
    import scala.jdk.CollectionConverters._
    assert(touched.value.asScala.toSet == Set(2),
      s"only shard 2 owns new ids, but ${touched.value} did graph work")
  }
}
