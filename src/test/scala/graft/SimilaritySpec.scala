package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** ANN correctness. Measured fixture reality (recorded in FIXTURES.md
  * correction): embeddings are near-uniform on the sphere — same-label
  * and different-label cosines are both ≈ 0 — so there is no cluster
  * structure to assert against. Instead we *plant* structure: seeded
  * perturbation twins at cosine ≈ 0.995, then assert exact brute force
  * recovers every twin and LSH recovers most.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  /** 20 twins: vec_id+10000 is vec_id slightly perturbed (deterministic
    * seed), renormalized → cosine ≈ 0.995 with its original.
    */
  private lazy val planted = {
    import spark.implicits._
    val base = emb.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val rnd = new scala.util.Random(7)
    val twins = base.map { case (id, v) =>
      // 0.01/dim noise => noise norm ≈ 0.08 => cosine ≈ 0.997 (angle ~4.5°)
      val noisy = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      val norm = math.sqrt(noisy.map(x => x.toDouble * x).sum).toFloat
      (id + 10000L, noisy.map(_ / norm))
    }
    twins.toSeq.toDF("vec_id", "embedding")
  }

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("brute-force top-1 recovers every planted twin") {
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val queries = emb.filter(col("vec_id") < 20)
    val top1 = Similarity.bruteForceTopK(queries, corpus, k = 1)
    val pairs = topkSet(top1)
    (0L until 20L).foreach { id =>
      assert(pairs.contains((id, id + 10000L)), s"query $id did not find its twin")
    }
  }

  test("brute-force top-k matches a driver-side exact recomputation") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select("q_id", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val qs = all.filter(_._1 < 5)
    val expected = qs.flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (cid, cv) =>
          var s = 0.0; var i = 0
          while (i < qv.length) { s += qv(i).toDouble * cv(i).toDouble; i += 1 }
          (cid, s)
        }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(3).zipWithIndex
        .map { case ((cid, _), i) => (qid, cid, i + 1) }
    }.toSet
    assert(got == expected)
  }

  test("IVF recovers nearly all planted twins (recall >= 0.9, 2-probe)") {
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val queries = emb.filter(col("vec_id") < 20)
    val found = topkSet(Similarity.ivfTopK(queries, corpus, k = 3))
    val recall = (0L until 20L).count(id => found.contains((id, id + 10000L))) / 20.0
    // cos 0.997 twins land in the query's own cell almost surely;
    // 2-probe covers boundary cases
    assert(recall >= 0.9, s"twin recall $recall")
  }

  test("exact quantized-Lloyd IVF recovers nearly all planted twins " +
      "(recall >= 0.9) and is deterministic under repartitioning") {
    // the quantizer behind the ORACLE-GATED q_ann_ivf (round 10):
    // twins at cosine 0.997 share a cell almost surely regardless of
    // which quantizer drew the boundaries, so the same ≥0.9
    // structure-recovery bar as the MLlib variant applies
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val queries = ivfQueries(corpus, emb.filter(col("vec_id") < 20))
    val recall = (0L until 20L).count(id => queries.contains((id, id + 10000L))) / 20.0
    assert(recall >= 0.9, s"twin recall $recall")
    // exact-integer training is partition-order-independent by
    // construction — assert it: 3 vs 7 shuffle partitions, identical
    // (cells, centroids)
    val (c3, m3) = withPartitions(3) { Similarity.exactIvfTrain(corpus) match {
      case (a, b) => (a.collect().toSet, b.collect().toSet) } }
    val (c7, m7) = withPartitions(7) { Similarity.exactIvfTrain(corpus) match {
      case (a, b) => (a.collect().toSet, b.collect().toSet) } }
    assert(c3 == c7 && m3 == m7, "exact IVF must be partitioning-invariant")
  }

  /** Probe helper mirroring q_ann_ivf's declared shape over an ad-hoc
    * corpus (fresh training, no cache).
    */
  private def ivfQueries(corpus: org.apache.spark.sql.DataFrame,
      qs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val (cells, cents) = Similarity.exactIvfTrain(corpus)
    val probe = Similarity.exactIvfProbeCells(qs, cents, Similarity.ExactIvfProbe)
    val q = qs.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val sims = probe.join(cells, "cell")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(q), "q_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.functions.VectorFunctions.vec_dot(col("q_emb"), col("embedding")).as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("dot").desc, col("vec_id"))
    topkSet(sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3))
  }

  private def withPartitions[T](n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("IVF index persists: build once, store cell-partitioned, probe the reload") {
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val queries = emb.filter(col("vec_id") < 20)
    val index = Similarity.buildIvfIndex(corpus).get
    // the serving layout: one directory per cell; probes against the
    // reloaded table prune to the probed cells' partitions
    val dir = SparkEnv.scratchDir("ivf-index")
    index.indexed.write.partitionBy("cell").mode("overwrite").parquet(dir)
    val reloaded = Similarity.IvfIndex(index.centroids, spark.read.parquet(dir))
    val fresh = topkSet(Similarity.probeIvf(index, queries, k = 3))
    val stored = topkSet(Similarity.probeIvf(reloaded, queries, k = 3))
    assert(fresh == stored, "probe(reloaded index) must equal probe(fresh index)")
    // partition pruning is real on the stored layout: filtering one
    // cell reads one partition directory
    val oneCell = spark.read.parquet(dir).filter(col("cell") === 0)
    val plan = oneCell.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
  }

  test("PQ with exact re-rank recovers nearly all planted twins (recall >= 0.9)") {
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val queries = emb.filter(col("vec_id") < 20)
    val model = Similarity.trainPq(corpus).get
    val found = topkSet(Similarity.pqTopK(queries, corpus, k = 3, model))
    val recall = (0L until 20L).count(id => found.contains((id, id + 10000L))) / 20.0
    // a cos-0.997 twin reconstructs closer than unrelated vectors in
    // nearly every subspace; the R=32 shortlist + exact re-rank
    // absorbs quantization noise
    assert(recall >= 0.9, s"twin recall $recall")
  }

  test("IVF-PQ composes both prunings: recall >= 0.9, ADC only after the cell join") {
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val queries = emb.filter(col("vec_id") < 20)
    val index = Similarity.buildIvfIndex(corpus).get
    val model = Similarity.trainPq(corpus).get
    val df = Similarity.ivfPqTopK(index, model, queries, k = 3)
    val found = topkSet(df)
    val recall = (0L until 20L).count(id => found.contains((id, id + 10000L))) / 20.0
    assert(recall >= 0.9, s"twin recall $recall")
    // the composition's point: ADC distances are evaluated above the
    // broadcast cell equi-join (probed members only) — a pq_adc_dist
    // below the join would mean a full-corpus ADC scan. Parents print
    // before children in the plan tree, so the project carrying the
    // ADC must appear before the join node.
    val plan = df.queryExecution.executedPlan.toString
    val adcAt = plan.indexOf("pq_adc_dist")
    // two BHJs exist (re-rank join prints first); anchor on the one
    // keyed by cell
    val joinAt = plan.indexOf("BroadcastHashJoin [cell")
    assert(adcAt >= 0 && joinAt >= 0 && adcAt < joinAt,
      s"pq_adc_dist must sit above the cell join:\n$plan")
  }

  test("declared PQ probes read the persisted code relation: no pq_encode in probe plans") {
    // round-5 verdict #3: both PQ paths re-encoded the raw corpus on
    // every probe call — the full-corpus scan PQ exists to avoid. The
    // declared queries now probe the cached parquet code relation
    // (built once per corpus dir); encode appears only at build time.
    for (q <- Seq("q_ann_pq", "q_ann_ivfpq")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("pq_encode"), s"$q probe plan re-encodes the corpus:\n$p")
      assert(df.count() > 0, s"$q returned no rows")
    }
    // and the cached relation equals a fresh encode exactly
    // (deterministic seeded model over a fixed corpus)
    val model = Similarity.cachedPqModel(emb, SparkSpec.sf).get
    val cached = Similarity.cachedPqCodes(spark, emb, SparkSpec.sf, model)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val fresh = Similarity.pqCodes(emb, model)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(cached == fresh)
  }

  test("PQ codes are m bytes (32x compression) and encoding is codegen-stable") {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    val model = Similarity.trainPq(emb).get
    val codes = emb.select(
      toColumn(graft.functions.PqEncode(toExpression(col("embedding")), model))
        .as("codes"))
    val lens = codes.select(length(col("codes")).as("l")).distinct().collect()
    assert(lens.length == 1 && lens(0).getInt(0) == 8, lens.mkString(","))
    // driver-side re-encode agrees with the distributed expression
    import spark.implicits._
    val viaExpr = emb.select(col("vec_id"),
      toColumn(graft.functions.PqEncode(toExpression(col("embedding")), model))
        .as("codes"))
      .as[(Long, Array[Byte])].collect().toMap
    val raw = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    raw.foreach { case (id, v) =>
      val local = model.encode(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))
      assert(java.util.Arrays.equals(viaExpr(id), local), s"vec $id codes differ")
    }
  }

  test("PQ on an empty corpus trains no model") {
    assert(Similarity.trainPq(emb.filter(col("vec_id") < -1)).isEmpty)
  }

  test("PQ treats wrong-dimension vectors as data, not exceptions") {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    import spark.implicits._
    val model = Similarity.trainPq(emb).get
    val dirty = Seq(
      (1L, Array.fill(64)(0.1f)),  // well-formed
      (2L, Array.fill(32)(0.1f)),  // truncated
      (3L, Array.empty[Float]))    // empty
      .toDF("vec_id", "embedding")
    val codes = dirty.select(col("vec_id"),
      toColumn(graft.functions.PqEncode(toExpression(col("embedding")), model))
        .as("codes")).collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(codes == Map(1L -> false, 2L -> true, 3L -> true), codes)
    // the search path simply drops them — no crash, no NULL ranks
    val queries = emb.filter(col("vec_id") < 2)
    val got = Similarity.pqTopK(queries, emb.select("vec_id", "embedding").union(
      dirty.filter(col("vec_id") > 1).withColumn("vec_id", col("vec_id") + 50000)),
      k = 3, model)
    assert(got.filter(col("cos_sim").isNull).count() == 0)
  }

  test("LSH recovers most planted twins (recall >= 0.6 at 8 planes)") {
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val queries = emb.filter(col("vec_id") < 20)
    val found = topkSet(Similarity.lshTopK(queries, corpus, k = 3, nPlanes = 8))
    val recall = (0L until 20L).count(id => found.contains((id, id + 10000L))) / 20.0
    // cos 0.995 => angle ~5.7 deg => P(all 8 planes agree) ~ 0.77;
    // deterministic seeds make the realized value stable run-to-run.
    assert(recall >= 0.6, s"twin recall $recall")
  }

  test("exhaustive multi-probe (maxFlips = nPlanes) degenerates to brute force") {
    // probing every bucket removes the approximation entirely — the
    // result must equal the exact broadcast scan, which pins the
    // probe-expansion + per-pair dedup machinery to exact semantics
    val queries = emb.filter(col("vec_id") < 5)
    val exact = topkSet(Similarity.bruteForceTopK(queries, emb, k = 3))
    val allProbes = topkSet(
      Similarity.lshTopK(queries, emb, k = 3, nPlanes = 4, maxFlips = 4))
    assert(allProbes == exact,
      s"missing=${exact -- allProbes} extra=${allProbes -- exact}")
  }

  test("semantic dedup collapses planted twins within cells, keeps everything else") {
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val index = Similarity.buildIvfIndex(corpus).get
    val out = Similarity.semanticDedup(index, tau = 0.9)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(2), r.getInt(3))) // (vec_id, group_id, is_kept)
    assert(rows.length == corpus.count(), "every vector appears exactly once")
    // canonical choice is structural: kept iff vec_id == its group minimum
    rows.foreach { case (id, g, k) => assert((k == 1) == (id == g), s"vec $id") }
    val kept = rows.filter(_._3 == 1).map(_._1).toSet
    val removed = rows.filter(_._3 == 0).map(_._1).toSet
    // at tau=0.9 only twin pairs qualify (max unrelated fixture cosine
    // ≈ 0.5), and min-id canonical keeps the base, removes the twin
    assert(removed.forall(_ >= 10000L), s"non-twin removed: ${removed.filter(_ < 10000L)}")
    removed.foreach(id => assert(kept.contains(id - 10000L), s"twin $id removed but base too"))
    // cos-0.997 twins share a nearest centroid except on a knife-edge
    // cell boundary — same bound as the IVF recall test
    val recall = removed.size / 20.0
    assert(recall >= 0.9, s"twin dedup recall $recall")
  }

  test("declared semantic dedup kept set is τ-separated within cells") {
    val out = SparkEntry.queries("q_semantic_dedup")(spark, sf)
    // the declared query carries its own (exact-quantizer) cells;
    // only the vectors come from the corpus
    val keptVecs = out.filter(col("is_kept") === 1).select("vec_id", "cell")
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val a = keptVecs.select(col("cell"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = keptVecs.select(col("cell").as("cell_b"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    // the user-facing guarantee: after dedup no same-cell survivor pair
    // is still a near-duplicate at the dedup threshold
    val survivors = a.join(b,
      col("cell") === col("cell_b") && col("id_a") < col("id_b") &&
        graft.functions.VectorFunctions.vec_dot(col("emb_a"), col("emb_b")) >= 0.4)
    assert(survivors.count() == 0)
    // and nothing was dropped from the relation itself
    assert(out.count() == emb.count())
  }

  test("LSH semantic dedup collapses twins that share all sign bits") {
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val out = Similarity.lshSemanticDedup(corpus, tau = 0.9, nPlanes = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(rows.length == corpus.count())
    rows.foreach { case (id, g, k) => assert((k == 1) == (id == g), s"vec $id") }
    val kept = rows.filter(_._3 == 1).map(_._1).toSet
    val removed = rows.filter(_._3 == 0).map(_._1).toSet
    assert(removed.forall(_ >= 10000L), s"non-twin removed: ${removed.filter(_ < 10000L)}")
    removed.foreach(id => assert(kept.contains(id - 10000L)))
    // P(one plane splits a cos-0.997 pair) ≈ angle/π ≈ 0.025, so
    // P(all 4 agree) ≈ 0.90 — deterministic seeds make the realized
    // value stable; 0.6 leaves slack for the fixture's draw
    val recall = removed.size / 20.0
    assert(recall >= 0.6, s"twin dedup recall $recall")
  }

  test("multi-probe LSH lifts twin recall to >= 0.8 at the same 8 planes") {
    // probing Hamming-distance-≤2 buckets recovers twins split by one
    // or two hyperplanes: P(≤2 planes disagree) ≈ 0.998 at cos 0.995 —
    // the recall/cost knob that needs no index rebuild
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val queries = emb.filter(col("vec_id") < 20)
    val single = topkSet(Similarity.lshTopK(queries, corpus, k = 3, nPlanes = 8))
    val multi = topkSet(
      Similarity.lshTopK(queries, corpus, k = 3, nPlanes = 8, maxFlips = 2))
    val recall = (0L until 20L).count(id => multi.contains((id, id + 10000L))) / 20.0
    assert(recall >= 0.8, s"twin recall $recall")
    val singleRecall =
      (0L until 20L).count(id => single.contains((id, id + 10000L))) / 20.0
    assert(recall >= singleRecall,
      s"multi-probe ($recall) must not lose recall vs single-probe ($singleRecall)")
  }
}
