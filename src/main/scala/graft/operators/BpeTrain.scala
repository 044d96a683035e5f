package graft.operators

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpression}

/** Distributed BPE vocabulary induction — tokenizer TRAINING over the
  * corpus (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — public paper), the missing half of the
  * K5 tokenization surface (`q_bpe_tokens` applies a BPE-ish regex;
  * this LEARNS the merge table a real tokenizer ships).
  *
  * Classic algorithm, Spark-shaped:
  *
  *  1. ONE corpus scan folds the corpus into the word-frequency
  *     relation (word, freq, syms) — after this, training never
  *     touches the corpus again. At 100 TB the corpus is petabytes of
  *     rows but |vocab| is millions: everything iterative happens on
  *     the compact relation, the same "heavy scan once, iterate on the
  *     summary" shape as IVF training and componentsStar.
  *  2. Each merge round: explode adjacent symbol pairs weighted by
  *     word freq (map-side partial sums — the shuffle moves
  *     O(distinct pairs × tasks) rows, not O(vocab)), take the
  *     argmax with a total order (count desc, then lexicographic pair
  *     — exact integer counts, so the winner is partition-order
  *     independent and engine-reproducible), and apply the winning
  *     merge to every word via the codegen'd [[graft.functions.MergePair]]
  *     expression. The driver receives exactly ONE row per round (the
  *     winner) — no vocab-sized collect anywhere.
  *  3. The merge list (rank, left, right) IS the artifact — a few KB
  *     for thousands of merges, broadcast-as-literal for encoding, the
  *     cachedRatioModel pattern.
  *
  * Encoding with a learned table is a LEFT FOLD of MergePair
  * applications in rank order — rank order over the word's symbols is
  * exactly the greedy BPE segmenter for merges learned this way.
  */
object BpeTrain {

  case class Merge(rank: Int, left: String, right: String, pair_count: Long)

  /** The word-frequency relation with initial character symbols plus
    * the `</w>` end-of-word marker (the classic formulation: merges
    * crossing word boundaries are impossible, and word-final units
    * stay distinct from word-internal ones).
    *
    * Words containing U+001F are EXCLUDED (advisor r11): the oracle's
    * doubled-separator string encoding reserves that code point as the
    * symbol boundary, so a corpus word containing it would silently
    * break the replace()-based merge replay. The trainer applies the
    * same exclusion (mirrored in `oracleChain`'s w0), making the
    * encoding's precondition part of the operator's contract rather
    * than an unchecked fixture assumption; real tokenizer pipelines
    * strip C0 controls in pre-tokenization anyway.
    */
  private[graft] def wordSymbols(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("\u001f"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("syms", concat(
        filter(split(col("w"), ""), s => length(s) > 0),
        array(lit("</w>"))))

  /** Adjacent-pair frequency relation of one round's words. The
    * size-≥-2 filter is load-bearing: a fully-merged word has ONE
    * symbol, and `sequence(0, size - 2)` = sequence(0, -1) DESCENDS
    * ([0, -1]) instead of being empty — under ANSI mode the -1 index
    * then throws mid-round.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "j -> struct(syms[j] AS l, syms[j + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("cnt"))

  /** Learn up to `numMerges` merges; stop early when no pair reaches
    * `minCount` (the classic convergence rule). Deterministic: integer
    * counts + total tiebreak.
    */
  def trainMerges(docs: DataFrame, numMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // eager localCheckpoint per round, NOT persist: the lineage cut is
    // what keeps round k's plan constant-size. Chained persists nest
    // each round's cached plan (and its AQE subtree) inside the next —
    // plan-string rendering went super-linear and OOM'd a 16 g driver
    // at ~24 rounds. Same pattern and trade-off as componentsStar
    // (reliable-storage checkpoints at cluster scale).
    var words = wordSymbols(docs).localCheckpoint(true)
    if (words.isEmpty) return Seq.empty
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(rank, l, r, cnt)
        words = words.withColumn("syms",
          toColumn(graft.functions.MergePair(
            toExpression(col("syms")), l, r))).localCheckpoint(true)
        rank += 1
      }
    }
    out.toSeq
  }

  /** Batched merge rounds — the production-scale trainer (round-7
    * verdict #6): [[trainMerges]] pays one argmax-collect +
    * localCheckpoint PER MERGE, i.e. a 32k-vocab run is 32k sequential
    * Spark jobs. This variant accepts up to `batchSize` merges per
    * round while PROVABLY reproducing the exact 1-per-round sequence
    * (BpeTrainSpec asserts equality against both [[trainMerges]] and
    * the single-node reference):
    *
    *  - Candidates are read in total order (cnt desc, l, r). The batch
    *    is the maximal SYMBOL-DISJOINT PREFIX: stop at the first
    *    candidate sharing a symbol with an accepted pair (skipping
    *    past it could diverge — the skipped pair's count may still
    *    outrank later picks after earlier merges fire).
    *  - Disjointness makes accepted counts invariant under the other
    *    accepted merges (merging (a,b) can only change counts of pairs
    *    containing a or b), and application order irrelevant.
    *  - STRICT-DOMINANCE guard: beyond the head pair, keep only
    *    accepted pairs with cnt STRICTLY greater than the first
    *    rejected candidate's count c*. Every pair created or changed
    *    by an accepted NON-self merge contains a touched symbol and
    *    derives from an old adjacency that itself conflicts (e.g. a
    *    new (x, ab) needs an old (x, a); a new (ab, ab) needs an old
    *    (b, a)), so its count is bounded by some rejected (hence
    *    ≤ c*) pair's old count — strictly below every kept pair, so
    *    the 1-per-round argmax provably picks the kept pairs in
    *    exactly this order before any new pair can surface. (The tie
    *    case is real: a new pair can tie c* and win the lexicographic
    *    tiebreak — hence STRICT.)
    *  - SELF-pair stop: a merge (a, a) is the one case whose created
    *    pair (aa, aa) derives from the ACCEPTED adjacency itself —
    *    runs of ≥ 4 a's yield (aa, aa) counts bounded only by
    *    cnt(a,a), which can outrank later accepted candidates (found
    *    in round-8 review: 100×"aaaaaa" gives (a,a)=500 then
    *    (aa,aa)=200 > a disjoint (b,c)=150 — the sequential trainer
    *    picks (aa,aa) second, a naive batch keeps (b,c)). An accepted
    *    self-pair therefore TERMINATES the batch: it is sound as the
    *    final member (everything the earlier non-self merges create
    *    is ≤ c* < its count), and whatever it spawns is recounted
    *    next round. (The exhausted-candidate-list branch needs no
    *    such guard: a self-pair (a,a) always coexists with some
    *    conflicting (a, x≠a) pair — the run's last `a` pairs with its
    *    successor or `</w>` — so a conflict-free full list contains
    *    no self-pair at all.)
    *
    * Worst case (every round collapses to 1 merge) equals the old
    * cost; on natural corpora most rounds accept near batchSize, so
    * driver round-trips drop ~batchSize×. A 32k vocabulary at
    * batchSize 256 is ~125 rounds instead of 32k.
    */
  def trainMergesBatched(docs: DataFrame, numMerges: Int,
      minCount: Long = 2L, batchSize: Int = 16): Seq[Merge] = {
    require(batchSize >= 1, "trainMergesBatched: batchSize must be >= 1")
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var words = wordSymbols(docs).localCheckpoint(true)
    if (words.isEmpty) return Seq.empty
    var done = false
    while (out.size < numMerges && !done) {
      val cap = math.min(batchSize, numMerges - out.size)
      // fetch enough to always see the first non-accepted candidate
      // (acceptance is capped at `cap` < `fetch`)
      val fetch = cap * 4 + 1
      val cand = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(fetch).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cand.isEmpty || cand(0)._3 < minCount) done = true
      else {
        val touched = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stopCnt = -1L // count of the first non-accepted candidate
        var i = 0
        var stopped = false
        var selfPairAccepted = false // see scaladoc: self-merge ends the batch
        while (i < cand.length && !stopped) {
          val (l, r, c) = cand(i)
          if (accepted.size >= cap || selfPairAccepted || c < minCount ||
              touched.contains(l) || touched.contains(r)) {
            stopCnt = c
            stopped = true
          } else {
            accepted += ((l, r, c)); touched += l; touched += r
            if (l == r) selfPairAccepted = true
          }
          i += 1
        }
        // if the loop exhausted the candidate list without stopping,
        // cand held EVERY pair (|pairs| < fetch) and none conflicts —
        // then no accepted merge creates or changes any pair at all
        // (a created pair (x, ab) needs an old conflicting (x, a)),
        // and the whole batch is safe as-is
        val safe =
          if (!stopped) accepted.toSeq
          else accepted.head +: accepted.tail.filter(_._3 > stopCnt).toSeq
        safe.foreach { case (l, r, c) =>
          out += Merge(out.size, l, r, c)
        }
        words = words.withColumn("syms",
          safe.foldLeft(col("syms")) { case (acc, (l, r, _)) =>
            toColumn(graft.functions.MergePair(toExpression(acc), l, r))
          }).localCheckpoint(true)
      }
    }
    out.toSeq
  }

  /** Apply a learned merge table to a symbol-array column: left fold
    * in rank order (greedy BPE segmentation). Compiles to `|merges|`
    * chained codegen'd MergePair calls — one generated loop, no UDF.
    */
  def applyMerges(syms: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) =>
      toColumn(graft.functions.MergePair(toExpression(c), m.left, m.right)))

  /** Declared-query merge budget — shared by the Spark trainer and
    * the unrolled DuckDB oracle below (they must agree or the replay
    * diverges by construction).
    */
  val NumMerges = 24

  /** Train-once cache per (session, corpus dir, rounds) — the
    * LanguageModel.artifactCache keying (round-14 review: a dir-only
    * key would serve a stale merge table to a later session over a
    * regenerated same-named directory).
    */
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, Int), Seq[Merge]]()

  def cachedMerges(docs: DataFrame, cacheKey: String,
      numMerges: Int = NumMerges): Seq[Merge] =
    // batched trainer: provably identical merge list, ~batchSize×
    // fewer driver round-trips (see trainMergesBatched scaladoc)
    graft.Memo.memo(mergeCache, (docs.sparkSession, cacheKey, numMerges))(
      trainMergesBatched(docs, numMerges))

  /** Unrolled chained-CTE DuckDB replay of the sequential trainer —
    * the round-10 ANN conversion pattern (fixed-round iterative
    * training IS oracle-expressible once each round is one argmax
    * over exact integers plus one deterministic rewrite).
    *
    * Representation: a word's symbol sequence is ONE string with each
    * symbol wrapped in U+001F unit separators (written ␟ below),
    * so [x, y, z] encodes as `␟x␟␟y␟␟z␟` - the inter-symbol
    * boundary is DOUBLED. Then
    *  - the adjacent pair (l, r) occurs iff `␟l␟␟r␟` occurs
    *    (symbols cannot contain the separator, so no cross-boundary
    *    false match even for multi-char symbols), and
    *  - DuckDB's `replace()` — left-to-right, non-overlapping,
    *    continue-after-replacement — applies the merge with EXACTLY
    *    [[graft.functions.MergePair]]'s contract: occurrences share
    *    no characters under the doubled boundary, so `[a,a,a,a]` →
    *    `[aa,aa]`, `[a,a,a]` → `[aa,a]`, byte-for-byte the skip-2
    *    scan.
    *
    * Each round k: `p_k` recounts freq-weighted adjacent pairs from
    * the split-back symbol lists (the q_pmi bigram idiom), `v_k`
    * takes the argmax under the trainer's total order (cnt DESC, l,
    * r — exact BIGINTs, engine-reproducible), `w_{k+1}` applies the
    * winner ONLY if it clears minCount=2 (so after exhaustion the
    * corpus freezes, the same sub-threshold argmax repeats, and the
    * final `cnt >= 2` filter drops every post-stop row — replaying
    * the trainer's early-stop exactly; an empty `v_k` after full
    * merging empties the chain, which filters to the same answer).
    * CTEs are `MATERIALIZED`: each `w_k` feeds two consumers, and
    * inlining would re-derive w_{k-1} twice per round — 2^R scans.
    */
  private def oracleChain(rounds: Int): String = {
    val sep = "chr(31)"
    val sb = new StringBuilder
    sb.append(
      s"""w0 AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
         |         $sep || array_to_string(list_append(string_split(w, ''), '</w>'), $sep || $sep) || $sep AS s
         |  FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w
         |        FROM documents WHERE text IS NOT NULL)
         |  WHERE len(w) > 0 AND NOT contains(w, $sep) GROUP BY w)""".stripMargin)
    for (k <- 0 until rounds) {
      sb.append(
        s""",
           |p$k AS (
           |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT freq, string_split(trim(s, $sep), $sep || $sep) AS syms FROM w$k) t,
           |       LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i) g
           |  GROUP BY 1, 2),
           |v$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
           |w${k + 1} AS MATERIALIZED (
           |  SELECT w.w, w.freq,
           |    CASE WHEN v.cnt >= 2 THEN replace(w.s, $sep || v.l || $sep || $sep || v.r || $sep, $sep || v.l || v.r || $sep) ELSE w.s END AS s
           |  FROM w$k w CROSS JOIN v$k v)""".stripMargin)
    }
    sb.toString
  }

  private def vocabOracle(rounds: Int): String = {
    val wins = (0 until rounds)
      .map(k => s"SELECT CAST($k AS BIGINT) AS rank, l, r, cnt FROM v$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${oracleChain(rounds)},
       |wins AS (
       |  $wins)
       |SELECT rank, l AS "left", r AS "right", l || r AS merged, cnt AS pair_count
       |FROM wins WHERE cnt >= 2 ORDER BY rank""".stripMargin
  }

  private def segmentOracle(rounds: Int): String =
    s"""WITH ${oracleChain(rounds)}
       |SELECT CAST(sum(freq) AS BIGINT) AS n_words,
       |       CAST(sum((len(string_split(w, '')) + 1) * freq) AS BIGINT) AS n_units_char,
       |       CAST(sum(len(string_split(trim(s, chr(31)), chr(31) || chr(31))) * freq) AS BIGINT) AS n_units_bpe,
       |       round(CAST(sum((len(string_split(w, '')) + 1) * freq) AS DOUBLE)
       |           / CAST(sum(len(string_split(trim(s, chr(31)), chr(31) || chr(31))) * freq) AS DOUBLE), 4) AS compression
       |FROM w$rounds""".stripMargin

  /** The learned merge table — VALUE-GATED since round 11 via the
    * unrolled chained-CTE replay above (was rows-only; BpeTrainSpec
    * additionally gates the distributed trainer against an in-test
    * single-node reference implementation).
    */
  val qBpeVocab = DeclaredQuery("q_bpe_vocab", vocabOracle(NumMerges)) { (s, d) =>
    import s.implicits._
    cachedMerges(Tables.documents(s, d), d).toDF()
      .withColumn("merged", concat(col("left"), col("right")))
      .select(col("rank").cast("long").as("rank"),
        col("left"), col("right"), col("merged"), col("pair_count"))
      .orderBy("rank")
  }

  /** The learned table applied back to the corpus: corpus-level
    * compression report (chars+marker symbols vs post-merge tokens).
    * Value-gated since round 11: the oracle carries the merge chain
    * one rewrite past the last argmax and aggregates the final symbol
    * strings.
    */
  val qBpeSegment = DeclaredQuery("q_bpe_segment", segmentOracle(NumMerges)) { (s, d) =>
    val docs = Tables.documents(s, d)
    val merges = cachedMerges(docs, d)
    val words = wordSymbols(docs)
    words
      .withColumn("n_sym0", size(col("syms")).cast("long") * col("freq"))
      .withColumn("n_sym",
        size(applyMerges(col("syms"), merges)).cast("long") * col("freq"))
      .agg(sum("freq").as("n_words"),
        sum("n_sym0").as("n_units_char"),
        sum("n_sym").as("n_units_bpe"))
      .withColumn("compression",
        round(col("n_units_char").cast("double") / col("n_units_bpe"), 4))
  }

  val all: Seq[DeclaredQuery] = Seq(qBpeVocab, qBpeSegment)
}
