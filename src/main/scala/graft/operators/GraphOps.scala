package graft.operators

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relations derived from the fixtures — round-9
  * coverage of the triangle-motif family that complements the existing
  * connected-components ([[Dedup]]) and PageRank ([[DomainRank]])
  * operators.
  *
  * The declared query counts triangles in the supplier co-occurrence
  * graph: suppliers are adjacent when they co-supply at least
  * [[GraphOps.EdgeSupport]] distinct orders. Co-occurrence triangles
  * are the standard clustering / community-strength signal (a dense
  * supplier triangle = a stable sourcing clique), and for an LLM-data
  * pipeline the identical shape computes co-citation / co-link
  * triangle density used for domain-quality weighting.
  *
  * 100 TB shape, in order of the three classic blow-ups it avoids:
  *
  *  1. '''Pair explosion''' — edges come from basket-local expansion
  *     (collect_set per order, then an array HOF producing the
  *     C(k,2) in-basket pairs), never a fact×fact self-join; one
  *     shuffle by order key, pair count bounded by Σ C(basket,2)
  *     (the q_brand_affinity precedent, measured A/B there).
  *  2. '''Hay edges''' — the support threshold (HAVING count ≥ 5) is
  *     applied in the same aggregate that deduplicates pairs, so the
  *     downstream graph is the ~10% of edges that repeat, not the
  *     random-co-occurrence noise floor.
  *  3. '''Wedge explosion''' — triangle enumeration uses
  *     degree-ordered orientation (each edge directed from its
  *     lower-(degree, id) endpoint): every triangle is generated from
  *     exactly one wedge at its lowest-degree apex, bounding wedges by
  *     Σ C(outdeg,2) with outdeg ≤ O(√m) on any graph — the
  *     arboricity bound behind every production triangle counter —
  *     instead of Σ C(deg,2) at hub nodes. The closing-edge probe is
  *     an equi-join on the oriented edge relation.
  *
  * The DuckDB oracle replays the same graph with the naive a<b<c
  * orientation — a DIFFERENT enumeration order over the same triangle
  * set — so the gate proves the oriented algorithm exact, not just
  * replayed. Integer counts, no floats anywhere.
  */
object GraphOps {

  /** Minimum distinct co-supplied orders for a graph edge. 5 keeps the
    * graph at the ~10% repeated-pair core at sf0.1 (47,703 of 453,588
    * candidate pairs, measured) while staying complete at the small
    * sfs where every pair repeats (mean pair support 18 at sf0.01).
    */
  val EdgeSupport = 5

  /** Memo for [[supplierEdges]] per (session, fixture dir): the
    * co-occurrence graph of a static fact table is a deterministic
    * DERIVED RELATION (a graph service materializes its edge list
    * once per snapshot), and it feeds BOTH graph queries — building
    * it per invocation re-ran the basket expansion each time. The
    * checkpoint-backed frame re-scans materialized blocks on cache
    * hits; the ITERATIVE work (wedges, frontiers) stays live per
    * query — only the input graph is build-once.
    */
  // LRU-bounded (round-15 review): the values pin eagerly-
  // materialized localCheckpoint BLOCKS, so an unbounded
  // session-keyed map grows block-manager usage monotonically in a
  // long-lived JVM; dropping the eldest strong reference lets
  // ContextCleaner reclaim its blocks
  private val edgeCache =
    graft.Memo.lruCache[(SparkSession, String), DataFrame](32)

  /** Undirected support-filtered edges (a < b) of the supplier
    * co-occurrence graph.
    */
  def supplierEdges(s: SparkSession, d: String): DataFrame =
    graft.Memo.lruMemo(edgeCache, (s, d))(buildSupplierEdges(s, d))

  private def buildSupplierEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    // collect_set dedupes suppliers within an order; the basket→pairs
    // expansion runs through the codegen'd ordered_pairs Generator
    // (the q_brand_affinity round-10 fix applied here too: the
    // interpreted transform/slice/flatten HOF combinators are
    // CodegenFallback, and this is the only data-sized stage of BOTH
    // graph queries). ordered_pairs sorts by id internally and emits
    // nothing for 1-element baskets, so the sort_array and the
    // size >= 2 / sequence-descend guards all fall away; the unused
    // lnf field is dropped immediately.
    val baskets = li.groupBy("l_orderkey")
      .agg(collect_set(struct(col("l_suppkey").cast("long").as("id"),
        lit(1).as("n"))).as("ss"))
    baskets.select(expr("ordered_pairs(ss)"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("sup"))
      .select(col("id_a").as("a"), col("id_b").as("b"), col("sup"))
      .filter(col("sup") >= EdgeSupport)
      .select("a", "b")
      // edges feed THREE consumers (degrees, orientation, the closing
      // probe) — cut lineage once here so the basket expansion runs a
      // single time, not per consumer (round-8 q_minhash lesson)
      .localCheckpoint()
  }

  /** Triangle rows (u, v, w) via degree-ordered wedge enumeration.
    * Endpoints of each triangle appear once, ordered by (degree, id).
    *
    * The oriented relation is deliberately NOT checkpointed even
    * though three consumers read it (both wedge legs + the closing
    * probe): it derives from the already-checkpointed edge relation
    * with one tiny groupBy + two broadcast joins, and re-deriving it
    * per consumer is cheaper than a materialization barrier (measured
    * at sf0.1: 2.74 s with the second checkpoint, 1.92 s without).
    */
  def triangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v")).unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    // degrees live on O(nodes) rows — broadcast-sized even when the
    // edge relation is huge (1000-node fixture graph; at 100 TB a
    // domain graph is ~1e8 nodes and this becomes a shuffle join, but
    // the wedge bound below is what actually matters)
    val withDeg = edges
      .join(broadcast(deg.select(col("v").as("a"), col("dg").as("da"))), "a")
      .join(broadcast(deg.select(col("v").as("b"), col("dg").as("db"))), "b")
    // orient every edge from its lower-(degree, id) endpoint; keep the
    // head's degree so wedge canonicalization needs no extra join
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
           (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("x"), col("db").as("dx")))
        .otherwise(struct(col("b").as("u"), col("a").as("x"), col("da").as("dx"))).as("e"))
      .select(col("e.u"), col("e.x"), col("e.dx"))
    val o1 = oriented.select(col("u"), col("x").as("v"), col("dx").as("dv"))
    val o2 = oriented.select(col("u"), col("x").as("w"), col("dx").as("dw"))
    // wedges at the lowest-(deg,id) apex; (v, w) canonical in the same
    // total order so each triangle closes exactly once
    val wedges = o1.join(o2, Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val closing = oriented.select(col("u").as("v"), col("x").as("w"))
    wedges.join(closing, Seq("v", "w")).select("u", "v", "w")
  }

  /** Top-20 suppliers by triangle participation in the co-supply
    * graph. Oracle: naive a<b<c three-way join over the identical
    * edge relation — same triangle set, independently enumerated.
    */
  val qTriangleCount = DeclaredQuery(
    "q_triangle_count",
    s"""WITH b AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |e AS (
       |  SELECT x.l_suppkey AS a, y.l_suppkey AS b
       |  FROM b x JOIN b y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
       |  GROUP BY 1, 2 HAVING count(*) >= $EdgeSupport),
       |t AS (
       |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
       |  FROM e e1 JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |n AS (
       |  SELECT u AS node FROM t
       |  UNION ALL SELECT v FROM t
       |  UNION ALL SELECT w FROM t)
       |SELECT s_suppkey, s_name, count(*) AS n_tri
       |FROM n JOIN supplier ON node = s_suppkey
       |GROUP BY 1, 2
       |ORDER BY n_tri DESC, s_suppkey
       |LIMIT 20""".stripMargin) { (s, d) =>
    val tris = triangles(supplierEdges(s, d))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .join(broadcast(sup), col("node") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_tri"))
      .orderBy(col("n_tri").desc, col("s_suppkey"))
      .limit(20)
  }

  /** BFS shortest hop distance (≤ 4) from the minimum-id node of the
    * supplier co-occurrence graph — the reachability/radius primitive
    * beside the repo's other graph operators (connected components,
    * PageRank, triangles). Frontier-style: each iteration expands only
    * the PREVIOUS level's nodes (one equi-join with the symmetrized
    * edge relation), dedupes, and anti-joins the visited set — so a
    * node's recorded hop is its first discovery = its minimum hop, and
    * per-iteration work is O(frontier-adjacent edges), never the walk
    * explosion a path-enumerating formulation would produce (avg
    * degree ~95 at sf0.1 ⇒ deg⁴ ≈ 8·10⁷ walks; the frontier form
    * touches ≤ |E| edges per level). Fixed 4 iterations (the
    * `q_domain_rank` determinism pattern); lineage cut per level.
    *
    * The seed is a 1-row driver aggregate (min node id) — the same
    * bounded-collect class as Dedup's convergence checks. The DuckDB
    * oracle replays with a recursive CTE under UNION (distinct)
    * semantics — its accumulated-dedup frontier is DuckDB's native
    * bounded BFS — and `min(hop) GROUP BY v` collapses both
    * formulations to the same shortest-hop relation. The anchor's
    * `HAVING count(*) > 0` (round-10, ADVICE r9) makes the oracle
    * return ZERO rows on an empty graph like the Spark guard does —
    * without it, `min(src)` over empty sym emits a (NULL, 0) row and
    * the two sides disagree exactly in the guarded regime.
    */
  val qBfsHops = DeclaredQuery(
    "q_bfs_hops",
    s"""WITH RECURSIVE
       |b AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |e AS (
       |  SELECT x.l_suppkey AS a, y.l_suppkey AS b
       |  FROM b x JOIN b y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
       |  GROUP BY 1, 2 HAVING count(*) >= $EdgeSupport),
       |sym AS (SELECT a AS src, b AS dst FROM e
       |        UNION ALL SELECT b, a FROM e),
       |walk(v, hop) AS (
       |  SELECT min(src), 0 FROM sym
       |  HAVING count(*) > 0
       |  UNION
       |  SELECT sym.dst, walk.hop + 1
       |  FROM walk JOIN sym ON sym.src = walk.v
       |  WHERE walk.hop < 4)
       |SELECT v, CAST(min(hop) AS BIGINT) AS hop
       |FROM walk GROUP BY v ORDER BY v""".stripMargin) { (s, d) =>
    val e = supplierEdges(s, d)
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
      // LAZY checkpoint: the seed aggregate right below materializes
      // the blocks in the same job; levels then re-read blocks
      .localCheckpoint(false)
    // bounded 1-row driver aggregate (seed choice), like the Dedup
    // convergence checks — not a data collect
    val seedRow = sym.agg(min(col("src"))).head()
    if (seedRow.isNullAt(0)) { // empty graph: no seed, empty result
      s.range(0).select(col("id").as("v"), col("id").as("hop"))
    } else {
      val seed = seedRow.getLong(0)
      var visited = s.range(1).select(lit(seed).as("v"), lit(0L).as("hop"))
      var frontier = visited.select("v")
      for (k <- 1 to 4) {
        val next = frontier.join(sym, col("v") === col("src"))
          .select(col("dst").as("v")).distinct()
          .join(visited.select("v"), Seq("v"), "left_anti")
          .select(col("v"), lit(k.toLong).as("hop"))
          // LAZY checkpoint (round 10): cuts the per-level lineage the
          // same way, but with a FIXED level count there is no
          // per-round convergence action, so eager cuts were 8 extra
          // jobs whose only consumer is the final action — lazy defers
          // materialization into that one job (each level's blocks
          // compute once and are re-read by both consumers: the union
          // and the next level's join). Measured 2.57 -> ~1.6 s at
          // sf0.1.
          .localCheckpoint(false)
        // visited needs no cut of its own: it is a ≤5-deep unionAll of
        // already-checkpointed levels
        visited = visited.unionAll(next)
        frontier = next.select("v")
      }
      visited.orderBy("v")
    }
  }

  val all: Seq[DeclaredQuery] = Seq(qTriangleCount, qBfsHops)
}
