package graft

import graft.operators.DomainRank
import org.apache.spark.sql.functions._

/** PageRank-style domain quality weighting (operators/DomainRank):
  * structural invariants the DuckDB value gate cannot see — mass
  * conservation across iterations, repartition-stability of the
  * quantized arithmetic, and convergence direction.
  */
class DomainRankSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("rank vector: one row per source, all ranks positive") {
    val (e, srcs, n) = DomainRank.sourceGraph(docs)
    val ranks = DomainRank.pageRank(e, srcs, n)
    assert(ranks.count() == n)
    assert(n == 20L, s"fixture has $n sources, expected 20")
    assert(ranks.filter(col("rank") <= 0).count() == 0)
  }

  test("mass is conserved: ranks sum to 1 within quantization slack") {
    // self-loops keep every node's out-degree ≥ 1 (no dangling mass),
    // so each damped step maps a unit vector to a unit vector; the
    // only loss is the 9-decimal quantization (≤ |V|·(|V|+1)·5e-10
    // per step)
    val (e, srcs, n) = DomainRank.sourceGraph(docs)
    val total = DomainRank.pageRank(e, srcs, n)
      .agg(sum(col("rank").cast("double"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-5, s"rank mass $total drifted from 1")
  }

  test("quantized iteration is value-stable under repartitioning") {
    // decimal per-step sums are associative/exact, so partitioning
    // must not change a single output bit — the property that lets
    // the DuckDB oracle replay a distributed computation at all
    val (e, srcs, n) = DomainRank.sourceGraph(docs)
    val a = DomainRank.pageRank(e, srcs, n).orderBy("node").collect()
    val (e2, srcs2, n2) = DomainRank.sourceGraph(docs.repartition(7))
    val b = DomainRank.pageRank(e2.repartition(3), srcs2, n2)
      .orderBy("node").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("ranks differentiate: iteration moves mass toward in-link-heavy domains") {
    val (e, srcs, n) = DomainRank.sourceGraph(docs)
    val ranks = DomainRank.pageRank(e, srcs, n)
    // the content-hash citation graph is irregular, so after 5 damped
    // steps the rank spread must exceed quantization noise — a
    // constant vector would mean the iteration is a no-op
    val mm = ranks.agg(
      min(col("rank").cast("double")), max(col("rank").cast("double"))).head()
    assert(mm.getDouble(1) - mm.getDouble(0) > 1e-4,
      s"ranks did not differentiate: $mm")
    // and the top node by weighted in-link share is ranked above the
    // bottom one (direction check on the fixed point)
    val inShare = e.groupBy(col("dst").as("node"))
      .agg(sum(col("w").cast("double") / col("outw")).as("in_share"))
    val joined = ranks.join(inShare, "node")
      .orderBy(col("in_share").desc).collect()
    assert(joined.head.getAs[java.math.BigDecimal]("rank").doubleValue() >
      joined.last.getAs[java.math.BigDecimal]("rank").doubleValue())
  }
}
