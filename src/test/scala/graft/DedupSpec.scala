package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** MinHash-LSH / SimHash / winnowing against the planted dup families
  * (FIXTURES.md: ~5 % of docs are near-dups sharing 40-char prefixes;
  * measured exact token-Jaccard of those pairs is ≥ 0.889).
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  /** Ground truth: exact 3-shingle Jaccard ≥ 0.5 over ALL pairs that
    * share at least one shingle (the shingle join IS the candidate
    * filter — unrelated docs share no 3-token shingle, measured
    * random-pair shingle-J ≤ 0.03, planted ≥ 0.889).
    */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val sh = Dedup.shingles(docs).withColumnRenamed("shingle", "elem")
    val cand = sh.select(col("doc_id").as("id_a"), col("elem"))
      .join(sh.select(col("doc_id").as("id_b"), col("elem")), Seq("elem"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    Dedup.shingleJaccard(docs, cand).filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("planted families exist (fixture sanity)") {
    assert(exactPairs.size >= 20)
  }

  test("minhash-LSH finds every planted high-Jaccard pair, no false positives") {
    val found = Dedup.minhashNearDups(docs, tau = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are verified with exact shingle Jaccard, so
    // found ⊆ truth is structural; found ⊇ truth is the probabilistic
    // part (P(miss) ≈ 4e-4 per pair at J≈0.89, b=8, r=4 —
    // deterministic seeds make this stable).
    assert(exactPairs.subsetOf(found),
      s"missed: ${exactPairs.diff(found)}")
    val extras = found.diff(exactPairs)
    assert(extras.isEmpty, s"false positives: $extras")
  }

  test("portable (md5-family) LSH pipeline keeps the planted recall — the " +
      "declared q_minhash_near_dups form detects what the production form does") {
    val found = Dedup.verifyCandidates(docs,
        Dedup.minhashCandidatesPortable(docs), tau = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // k=16/b=4/r=4 has P(miss) ≈ (1-0.89^4)^4 ≈ 2e-3 per planted pair;
    // deterministic hashing makes the result stable run-to-run
    assert(exactPairs.subsetOf(found), s"missed: ${exactPairs.diff(found)}")
    assert(found.diff(exactPairs).isEmpty,
      s"false positives: ${found.diff(exactPairs)}")
  }

  test("portable (md5) simhash pairs are high-Jaccard pairs too") {
    val sim = Dedup.simhashNearDups(docs, maxDist = 3, portableHash = true)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.subsetOf(exactPairs), s"non-near-dup pairs: ${sim.diff(exactPairs)}")
    assert(sim.size >= exactPairs.size / 2,
      s"md5 simhash found only ${sim.size} of ${exactPairs.size}")
  }

  test("dedup is idempotent (dropDuplicates fixpoint)") {
    val once = docs.dropDuplicates("text")
    assert(once.count() == once.dropDuplicates("text").count())
  }

  test("simhash pairs are high-Jaccard pairs") {
    val sim = Dedup.simhashNearDups(docs, maxDist = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // shingle-simhash with small hamming distance is a *stricter*
    // near-dup notion; every simhash pair must be a true near-dup,
    // and it should catch a majority of the planted ones.
    assert(sim.subsetOf(exactPairs), s"non-near-dup simhash pairs: ${sim.diff(exactPairs)}")
    assert(sim.size >= exactPairs.size / 2,
      s"simhash found only ${sim.size} of ${exactPairs.size}")
  }

  test("hand-rolled minhash agrees with MLlib MinHashLSH on the planted pairs") {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val shingled = Dedup.shingles(docs)
      .groupBy("doc_id").agg(collect_list("shingle").as("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = tf.transform(shingled)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42).fit(vecs)
    val mlPairs = mh.approxSimilarityJoin(vecs, vecs, 0.5, "dist")
      .select(col("datasetA.doc_id").as("id_a"), col("datasetB.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both detectors must find (at least) the exact high-Jaccard truth
    val missedByMl = exactPairs.diff(mlPairs)
    assert(missedByMl.size <= exactPairs.size / 10, s"MLlib missed $missedByMl")
    // and our verified pipeline stays a subset of ground truth, so the
    // two approaches agree on every pair we emit
    val ours = Dedup.minhashNearDups(docs, tau = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ours.diff(mlPairs).size <= ours.size / 10,
      s"hand-rolled pairs unknown to MLlib: ${ours.diff(mlPairs)}")
  }

  test("components: chains merge, families stay apart, isolated nodes absent") {
    import spark.implicits._
    // two families: {1,2,3} via a chain (1-2, 2-3), {10,11}; no node 7
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.components(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("passage overlap finds lifted passages that doc-level minhash misses") {
    import spark.implicits._
    // two long, unrelated docs sharing one 14-word passage: whole-doc
    // Jaccard is tiny (minhash at tau=0.8 must NOT pair them) but the
    // winnow fingerprints of the shared passage collide exactly
    val passage = "the quick brown fox jumps over the lazy dog near the old stone bridge"
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val docA = words("alpha", 40) + " " + passage + " " + words("omega", 40)
    val docB = words("beta", 40) + " " + passage + " " + words("gamma", 40)
    val docC = words("delta", 90) // no shared passage
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val pairs = Dedup.passageOverlapPairs(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs.contains((1L, 2L)), s"lifted passage must pair: $pairs")
    assert(pairs.keySet == Set((1L, 2L)), s"unrelated docs must not pair: $pairs")
    val ov = pairs((1L, 2L))
    assert(ov > 0.0 && ov <= 1.0, s"overlap fraction out of range: $ov")
    val viaMinhash = Dedup.minhashNearDups(docs, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!viaMinhash.contains((1L, 2L)),
      "doc-level minhash should miss a single lifted passage — that's the point")
  }

  test("passage overlap bit-matches the relational combinator form") {
    // the ordered_pairs generator replaced the interpreted
    // transform/slice/flatten pair expansion (round-6 verdict #5);
    // this pins value parity of the whole pipeline against the old
    // relational form on the real fixture corpus
    import org.apache.spark.sql.functions._
    val (n, w, minShared, maxDf) = (3, 4, 2, 64)
    val rows = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), expr(s"winnow_fps(text, $n, $w)").as("fps"))
      .select(col("doc_id"), size(col("fps")).as("nf"), explode(col("fps")).as("fp"))
    val oldForm = rows.groupBy("fp")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("nf")))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxDf)
      .select(explode(expr(
        "flatten(transform(sequence(0, size(ids) - 2), " +
          "i -> transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "b -> struct(ids[i].doc_id AS id_a, ids[i].nf AS n_a, " +
          "b.doc_id AS id_b, b.nf AS n_b))))")).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
      .select(col("id_a"), col("id_b"), col("n_shared_fps"),
        round(col("n_shared_fps").cast("double") /
          least(col("n_a"), col("n_b")), 6).as("overlap"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(key(Dedup.passageOverlapPairs(docs)) == key(oldForm))
  }

  test("ordered_pairs generator: pair set, lnf reduction, degenerate inputs") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq((10L, 5), (20L, 3), (30L, 7))), // 3 pairs
      (2L, Seq((40L, 1))),                     // single element: no pairs
      (3L, Seq.empty[(Long, Int)]))            // empty: no pairs
      .toDF("bucket", "raw")
      .selectExpr("bucket",
        "transform(raw, x -> struct(x._1 AS doc_id, x._2 AS nf)) AS ids")
    val got = df.selectExpr("bucket", "ordered_pairs(ids)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == Set((1L, 10L, 20L, 3), (1L, 10L, 30L, 5), (1L, 20L, 30L, 3)))
    // NULL array → zero rows, not NPE
    val withNull = df.selectExpr("CASE WHEN bucket = 1 THEN ids END AS ids")
    assert(withNull.selectExpr("ordered_pairs(ids)").count() == 3L)
  }

  test("passage overlap on an empty corpus is empty, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.passageOverlapPairs(empty).count() == 0L)
  }

  test("passage overlap recovers the fixture's planted near-dup families") {
    // byte-near-identical docs share nearly all fingerprints, so every
    // planted minhash near-dup pair must also be a passage-overlap pair
    val planted = Dedup.minhashNearDups(docs, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.nonEmpty, "fixture should plant near-dup families")
    val viaPassage = Dedup.passageOverlapPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = planted -- viaPassage
    assert(missed.isEmpty, s"planted near-dups missing passage overlap: $missed")
  }

  test("large-star/small-star equals min-label propagation on planted families") {
    import spark.implicits._
    // chains, a triangle-with-tail, two isolated pairs, high ids
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L),
      (50L, 51L), (60L, 61L),
      (100L, 7L)).toDF("id_a", "id_b")
    val viaProp = Dedup.components(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = Dedup.componentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaProp, s"star=$viaStar prop=$viaProp")
    assert(viaStar(4L) == 1L && viaStar(23L) == 20L && viaStar(100L) == 7L)
  }

  test("large-star/small-star round count is logarithmic on a long chain") {
    import spark.implicits._
    // a 64-link chain: min-label propagation needs ~diameter rounds to
    // carry node 0's label to node 64; star alternations collapse it
    // exponentially
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.componentsStarCounted(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 64L).map(_ -> 0L).toMap)
    assert(rounds <= 8, s"expected O(log n) alternations on a 64-chain, got $rounds")
  }

  test("componentsStar with a reliable checkpoint dir matches and writes rounds") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val dir = SparkEnv.scratchDir("cc-ckpt-spec")
    val got = Dedup.componentsStar(edges, Some(dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // each run checkpoints under its own cc-run-* subdir; earlier
    // rounds are cleaned eagerly, the final round's files back the
    // returned labels frame
    val runs = new java.io.File(dir).listFiles()
    assert(runs != null && runs.exists(f => f.getName.startsWith("cc-run-") &&
      Option(f.listFiles()).exists(_.exists(_.getName.startsWith("cc-round-")))),
      s"expected a cc-run-*/cc-round-* checkpoint under $dir")
  }

  test("incremental exact dedup flags exactly the planted historical copies") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hist = docs.filter(col("doc_id") < 400)
    // batch: 5 byte-identical copies of historical texts under new
    // ids, plus genuinely new docs (ids >= 400)
    val copies = hist.limit(5).collect().zipWithIndex.map { case (r, i) =>
      (900000L + i, r.getString(1), r.getString(2), r.getString(3), r.getLong(4))
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = docs.filter(col("doc_id") >= 400).union(copies)
    val flagged = Dedup.incrementalExactDups(hist, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == (0 until 5).map(i => 900000L + i).toSet,
      s"flagged: $flagged")
  }

  test("winnowing: every planted pair shares fingerprints") {
    val fp = Dedup.winnowFingerprints(docs)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    exactPairs.foreach { case (a, b) =>
      val shared = byDoc(a).intersect(byDoc(b))
      assert(shared.nonEmpty, s"pair ($a,$b) shares no fingerprints")
    }
  }
}
