package graft

import graft.operators.Dedup
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Whole-signature sketch expressions vs their relational reference
  * forms: bit-identical minhash signatures and simhash fingerprints,
  * null semantics, codegen membership.
  */
class SketchExprSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("minhash_sig equals the relational explode/groupBy signatures bit-for-bit") {
    val k = 32
    val viaExpr = docs
      .select(col("doc_id"), expr(s"minhash_sig(text, 3, $k)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaRel = Dedup.minhashSignatures(
      Dedup.shingleRows(docs).select("doc_id", "shingle"), k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(i => r.getLong(i)).toVector)
      .toMap
    assert(viaExpr.keySet == viaRel.keySet)
    viaRel.foreach { case (id, sig) =>
      assert(viaExpr(id) == sig, s"doc $id signature differs")
    }
  }

  test("simhash64 equals the relational 64-sum-aggregate form bit-for-bit") {
    // the round-3 relational reference: distinct (doc, shingle-hash)
    // pairs → 64 per-bit ±1 sums → sign bits
    val sh = Dedup.shingleRows(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h")).distinct()
    val bitAggs = (0 until 64).map(b =>
      sum(when(expr(s"shiftright(h, $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b"))
    val hashCol = (0 until 64)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val viaRel = sh.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), hashCol.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaRel)
  }

  test("null text yields null sketches; empty text yields defined ones") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val r = df.selectExpr("doc_id", "minhash_sig(text, 3, 4) AS sig",
      "simhash64(text, 3) AS fp").orderBy("doc_id").collect()
    assert(r(0).isNullAt(1) && r(0).isNullAt(2))
    assert(!r(1).isNullAt(1) && !r(1).isNullAt(2))
    assert(r(2).getSeq[Long](1).size == 4)
    // Dedup.simhash drops NULL-text docs (matching the old relational
    // row set)
    assert(Dedup.simhash(df).count() == 2)
  }

  test("winnow_fps equals the relational window-min + distinct form") {
    val viaExpr = docs
      .select(col("doc_id"), expr("winnow_fps(text, 3, 4)").as("fps"))
      .filter(col("fps").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val viaRel = Dedup.winnowFingerprints(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(viaExpr == viaRel)
    // sorted-ascending output (determinism contract) and short texts
    // still emit the whole-text fingerprint
    import spark.implicits._
    val tiny = Seq((1L, "ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "winnow_fps(text, 3, 4) AS fps")
      .orderBy("doc_id").collect()
    assert(tiny(0).getSeq[Long](1).size == 1)
    assert(tiny(1).isNullAt(1))
  }

  test("winnow_fps_md5 equals the relational portable-hash form AND the " +
      "driver-side md5-prefix reference (the oracle-gate hash contract)") {
    // relational twin: conv(substring(md5(s),1,15),16,10) — the Spark
    // SQL spelling of DuckDB's CAST('0x' || substr(md5(s),1,15) AS BIGINT)
    val viaExpr = docs
      .select(col("doc_id"), expr("winnow_fps_md5(text, 3, 4)").as("fps"))
      .filter(col("fps").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val viaRel = Dedup.winnowFingerprints(docs, portableHash = true).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(viaExpr == viaRel)
    // driver-side reference pins the exact 60-bit value (top 60 bits
    // of the md5 digest = first 15 hex chars) on edge shapes
    def md5fp(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var v = 0L
      (0 until 8).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      v >>> 4
    }
    def ref(t: String, n: Int, w: Int): Seq[Long] = {
      val toks = t.split(" ", -1)
      val shingles =
        if (toks.length < n) Seq(t) else toks.sliding(n).map(_.mkString(" ")).toSeq
      val hs = shingles.map(md5fp)
      hs.indices.map(i => hs.slice(math.max(0, i - w + 1), i + 1).min)
        .distinct.sorted
    }
    import spark.implicits._
    val texts = Seq("", "one", "a  b", " lead", "trail ", "p q r s t u v w")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.selectExpr("doc_id", "winnow_fps_md5(text, 3, 4) AS fps")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t, 3, 4).toList, s"doc=$i text='$t'")
    }
    assert(ref("p q r s t u v w", 3, 4).forall(v => v >= 0L && v < (1L << 60)))
  }

  test("mersenneMix equals BigInt (a*x+b) mod 2^61-1 on boundary and random inputs") {
    import graft.functions.ShingleScan.{mersenneMix, MERSENNE61}
    val P = BigInt(MERSENNE61)
    def ref(a: Long, x: Long, b: Long): Long =
      ((BigInt(a) * BigInt(x) + BigInt(b)) mod P).toLong
    val max60 = (1L << 60) - 1
    val boundary = Seq(0L, 1L, 2L, (1L << 30) - 1, (1L << 30), (1L << 59),
      max60 - 1, max60, MERSENNE61 - 1)
    for (a <- boundary; x <- boundary; b <- Seq(0L, 1L, max60, MERSENNE61 - 1))
      assert(mersenneMix(a, x, b) == ref(a, x, b), s"a=$a x=$x b=$b")
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong() >>> 4 // < 2^60
      val x = rnd.nextLong() >>> 4
      val b = rnd.nextLong() >>> 3 // < 2^61
      assert(mersenneMix(a, x, b) == ref(a, x, b), s"a=$a x=$x b=$b")
    }
  }

  test("minhash_sig_md5 / simhash64_md5 equal driver-side references on edge shapes " +
      "(the oracle-gate hash contract for the LSH and simhash pipelines)") {
    import spark.implicits._
    def md5fp(prefix: String, s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((prefix + s).getBytes("UTF-8"))
      var v = 0L
      (0 until 8).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      v >>> 4
    }
    def shinglesOf(t: String, n: Int): Seq[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < n) Seq(t) else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    val texts = Seq("", "one", "a  b", " lead", "trail ",
      "p q r s t u v w", "x x x x x x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // minhash_sig_md5: Carter–Wegman family over ONE fp60 per shingle
    // — BigInt reference arithmetic pins the exact Mersenne-fold mod
    val k = 8
    val P = BigInt((1L << 61) - 1)
    val mh = df.selectExpr("doc_id", s"minhash_sig_md5(text, 3, $k) AS sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = (0 until k).map { fam =>
        val a = BigInt(md5fp("", s"a:$fam") | 1L)
        val b = BigInt(md5fp("", s"b:$fam"))
        shinglesOf(t, 3)
          .map(s => ((a * BigInt(md5fp("", s)) + b) mod P).toLong).min
      }.toVector
      assert(mh(i.toLong) == want, s"minhash doc=$i text='$t'")
    }
    // simhash64_md5: ±1 votes over DISTINCT fp60s, bits 0..59
    val sh = df.selectExpr("doc_id", "simhash64_md5(text, 3) AS f")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val fps = shinglesOf(t, 3).map(s => md5fp("", s)).distinct
      val want = (0 until 60).foldLeft(0L) { (acc, b) =>
        val v = fps.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (v > 0) acc | (1L << b) else acc
      }
      assert(sh(i.toLong) == want, s"simhash doc=$i text='$t'")
      assert((sh(i.toLong) >>> 60) == 0L, "md5-mode simhash must keep bits 60..63 clear")
    }
  }

  test("winnow_fps randomized parity vs a driver-side reference (edge shapes)") {
    // seeded random corpora with the shapes the fixture lacks: empty
    // strings, single tokens, consecutive spaces (empty tokens),
    // heavy repetition, sub-n docs
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val rnd = new scala.util.Random(13)
    val vocab = Seq("a", "bb", "ccc", "dd", "e", "")
    def randText(): String =
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val texts = Seq("", "one", "a  b", " lead", "trail ") ++
      (1 to 60).map(_ => randText())
    def ref(t: String, n: Int, w: Int): Seq[Long] = {
      val toks = t.split(" ", -1)
      val shingles =
        if (toks.length < n) Seq(t)
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val hs = shingles.map(s => XXH64.hashUTF8String(UTF8String.fromString(s), 42L))
      hs.indices.map(i => hs.slice(math.max(0, i - w + 1), i + 1).min)
        .distinct.sorted
    }
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for ((n, w) <- Seq((3, 4), (2, 2), (4, 7))) {
      val got = df.selectExpr("doc_id", s"winnow_fps(text, $n, $w) AS fps")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == ref(t, n, w).toList,
          s"n=$n w=$w doc=$i text='${t.take(40)}'")
      }
    }
    // the same edge corpus through the OTHER sketch expressions vs
    // their relational references — the fixture has no empty tokens /
    // sub-n docs, so the parity claims get their edge coverage here
    val mhExpr = df.selectExpr("doc_id", "minhash_sig(text, 3, 8) AS sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val mhRel = Dedup.minhashSignatures(
      Dedup.shingleRows(df).select("doc_id", "shingle"), 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)).toVector)
      .toMap
    assert(mhRel.keySet.subsetOf(mhExpr.keySet))
    mhRel.foreach { case (id, sig) => assert(mhExpr(id) == sig, s"doc $id") }
  }

  test("NULL-text docs never become minhash candidates") {
    // A NULL sig bands to the constant xxhash64 seed — unfiltered, every
    // NULL-text doc shares every bucket and the candidate set goes
    // O(M²). minhashCandidates must drop them pre-projection, matching
    // the old explode form (no shingle rows → no buckets).
    import spark.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words in this unrelated document body"))
    val nulls = (10L to 15L).map(i => (i, null.asInstanceOf[String]))
    val df = (base ++ nulls).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"identical docs must pair: $pairs")
    assert(pairs.forall { case (a, b) => a < 10 && b < 10 },
      s"NULL-text doc ids leaked into candidates: $pairs")
  }

  test("sketch expressions evaluate inside whole-stage codegen") {
    val df = docs.select(expr("minhash_sig(text, 3, 8)").as("sig"),
      expr("simhash64(text, 3)").as("fp"))
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = finalPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(s).isDefined &&
      s.contains("minhash_sig") && s.contains("simhash64"),
      s"expected codegen'd Project with both sketch expressions:\n$s")
  }
}
