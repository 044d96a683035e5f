#!/usr/bin/env python3
"""Generate BASELINE_full.md from the full-suite DuckDB baseline JSON
(tools/bench_duckdb_full.py) and the Spark full-bench JSON
(BENCH_full.json / bench_full_latest.json).

Usage: python3 tools/make_baseline_full.py <duck.json> <spark.json> <out.md>
"""
import json
import sys


def main():
    duck = json.load(open(sys.argv[1]))
    spark = json.load(open(sys.argv[2]))
    out = sys.argv[3]
    dq, sq = duck["queries"], spark["queries"]
    common = sorted(set(dq) & set(sq))
    spark_only = sorted(set(sq) - set(dq))
    d_tot = sum(dq[q] for q in common)
    s_tot = sum(sq[q] for q in common)
    stream = [q for q in common if q.startswith("q_stream_")]
    batch = [q for q in common if not q.startswith("q_stream_")]
    d_b, s_b = sum(dq[q] for q in batch), sum(sq[q] for q in batch)
    d_s, s_s = sum(dq[q] for q in stream), sum(sq[q] for q in stream)
    lines = []
    a = lines.append
    a("# BASELINE_full — full-suite DuckDB baseline vs Spark bench (round 15)")
    a("")
    a("Round-8 verdict #1: the 2x bench contract was being judged against a")
    a("10-query 0.27 s headline denominator covering ~6% of the suite. This")
    a("file is the honest denominator: EVERY `SparkEntry.oracleSql` string")
    a("executed in DuckDB at sf0.1, alongside the Spark bench for the same")
    a("queries.")
    a("")
    a("## Protocol")
    a("")
    a(f"- DuckDB: {duck['engine']}, views over `{duck['sf']}/*.parquet`,")
    a(f"  {duck['passes']} passes interleaved pass-major, per-query MIN")
    a("  (same estimator as Bench.scala; this host's vCPUs stall under")
    a("  external load, so min is the throughput estimate). Reproduce:")
    a("  `python3 tools/bench_duckdb_full.py <sf> <oracle_sql.json> <out>`.")
    a(f"- Spark: `graft.Bench` (local[32], {spark.get('passes', 3)} passes, per-query min,")
    a("  toRdd.count of the full declared plan, AQE on — the round-9 A/B")
    a("  measured AQE-off as a net loss across the suite, see Bench.scala).")
    a("- Totals compare the COMMON query set only (both engines ran the")
    a("  identical semantics; `no_oracle` queries are excluded).")
    a("- Round-15 refresh (2026-08-16): common set 222 → 224 (the new")
    a("  gates q_ann_purged_search — HNSW GDPR delete leg, exact")
    a("  top-k-over-survivors oracle — and q_stream_join_view —")
    a("  continuous join-view maintenance, full-recompute oracle). The")
    a("  join-view twin carries the documented streaming micro-batch")
    a("  floor (3 ingest chunks + the churn maintenance batch) against")
    a("  a millisecond SQL recompute, the q_stream_stream_join_wm")
    a("  pricing class. Spark-side round-15 changes are scale hygiene")
    a("  (session-derived parallelism constants, group-streamed HNSW")
    a("  shard builds) — carried-over per-query minima comparable.")
    a("- Round-14 FINAL refresh (2026-08-16, post review sweeps): common")
    a("  set 221 → 222 (q_incremental_user_purge, the IVM delete leg).")
    a("  Six targeted high-effort review sweeps (round diff, sketch")
    a("  functions, pipeline operators, text stack, analytics, dedup +")
    a("  core queries) fixed ~30 findings — engine-parity guards (flat-")
    a("  baseline anomaly, ANSI divide-by-zero, NULL ordering, NULL")
    a("  payloads/elements), Hadoop-FS checkpoints, codegen'd pair")
    a("  generators replacing the last interpreted expansions, bounded")
    a("  pair collection, per-row MD5 reuse, session-keyed caches. Ten")
    a("  oracle texts changed in the sweeps; their DuckDB minima are")
    a("  fresh-run only (no min-merge across differing SQL).")
    a("- Round-14 refresh (2026-08-16): common set 218 → 221 (the new")
    a("  scale-honest twins q_stream_stream_join_wm — 2 h watermark")
    a("  through real multi-batch eviction over time-ordered ingest")
    a("  chunks — and q_approx_percentiles_prod — default-accuracy")
    a("  bounded-state GK — plus q_incremental_join_view, JOIN-view")
    a("  maintenance by the signed delta rule gated against the full")
    a("  recompute). The round-13 streaming-twin drift adjudicated as")
    a("  host-session noise: a fresh same-code measurement moved the")
    a("  whole class back down uniformly (26.07 → ~23 s; SCALING.md")
    a("  round-14). The wm join twin is priced at ~3× the single-batch")
    a("  twin BY DESIGN (3 micro-batches × the ~1 s/batch floor) — the")
    a("  cost of gating real eviction; its DuckDB twin is the same")
    a("  0.02 s batch self-join, so it alone adds ~+0.13 to the")
    a("  streaming-cut ratio. Both cuts are published: the r13 set")
    a("  (comparable round-over-round) and the current set.")
    a("- Round-13 refresh (2026-08-16): common set 216 → 218 (the new")
    a("  governance gates q_l_diversity and q_t_closeness). The headline")
    a("  mover is the codegen compile cache (SCALING.md round-13 floor")
    a("  decomposition): spark.sql.codegen.cache.maxEntries was at its")
    a("  100-entry default against a ~2k-unit query library, so every")
    a("  action of every pass recompiled every whole-stage unit; sized")
    a("  to 5000 the suite dropped 96.9 → 72.2 s in the A/B and Spark")
    a("  now beats DuckDB outright on the common AND batch cuts. DuckDB")
    a("  side min-merged over two serial 2-pass sessions as before.")
    a("- Round-12 FINAL refresh (2026-08-16): common set 204 → 210 —")
    a("  the estimator-split sketch gates (q_kmv_distinct_users md5")
    a("  fp60 + state/estimator split; q_approx_percentiles exact-regime")
    a("  GK), q_state_reader (statestore source), q_xml_source, and")
    a("  q_ann_hnsw (exact-parity gate). DuckDB min-merged over FOUR")
    a("  serial runs this refresh; the duck tool now CPU-warms before")
    a("  timing exactly like Bench.scala (the host ramps vCPU frequency")
    a("  under load — warming moved totals < 2%, i.e. prior refreshes")
    a("  were not cold-biased, but the protocols are now symmetric).")
    a("- Round-12 refresh (2026-08-15): common set 202 → 204 (the two")
    a("  last class-(a) rows-only conversions: q_quality_classifier's")
    a("  12-round quantized-GD chained-CTE replay and")
    a("  q_stratified_sample's identity-hash thresholds). Spark-side")
    a("  round-12 rewrites land here: q_containment_pairs (join-free,")
    a("  scan-time totals), q_brand_affinity (bit_or bitmask baskets +")
    a("  mask_pairs), q_stream_account_daily (no-watermark upsert cube,")
    a("  snapshot fast path).")
    a("- Round-11 refresh (2026-08-15): per-query minima across TWO")
    a("  protocol-identical SERIAL same-session runs of EACH engine")
    a("  (never concurrent — a same-host DuckDB run measured +8% on the")
    a("  Spark side and vice versa). The common set grew 197 → 202 with")
    a("  the round-11 conversions; the five new oracles cut BOTH ways —")
    a("  the BPE chains are cheap in DuckDB while Spark's trainer runs")
    a("  24 sequential argmax jobs (then serves the train-once cache),")
    a("  and the md5-minhash replays behind q_stream_near_dups /")
    a("  q_stream_clean_pipeline cost DuckDB ~10 s each, which is why")
    a("  the streaming-twin cut now favors Spark outright. Run-to-run")
    a("  host variance remains the dominant error term (|Δratio| ≲ 0.4")
    a("  across sessions is noise — compare per-query minima when")
    a("  auditing an operator).")
    a("")
    a("## Totals")
    a("")
    a("| set | n | DuckDB s | Spark s | ratio |")
    a("|---|---|---|---|---|")
    a(f"| common suite | {len(common)} | {d_tot:.2f} | {s_tot:.2f} | {s_tot/d_tot:.2f}x |")
    a(f"| batch-only | {len(batch)} | {d_b:.2f} | {s_b:.2f} | {s_b/d_b:.2f}x |")
    # artifact-backed queries: the oracle replays full quantizer/cluster
    # TRAINING (or transitive closure) in DuckDB per run, while Spark
    # serves probes from a persisted/cached artifact (build-once/
    # probe-many; pass-1 pays the build, min excludes it). Round 11
    # extends the set with the cached component-label artifacts
    # (q_*_semantic_dedup / q_dedup_clusters / the BPE merge table) so
    # the amortization advantage stays visible, not hidden in the total.
    # Round 12 adds q_quality_classifier (cached quantized-GD model vs
    # a 12-round chained-CTE replay per DuckDB run), q_brand_affinity
    # (memoized 25-value brand dictionary — the one extra action in the
    # query), and q_state_reader (the streaming-agg CHECKPOINT is the
    # build-once artifact; the declared query times the statestore
    # read, while the oracle re-aggregates the events table per run)
    # to the disclosed set.
    indexed = [q for q in batch if q in (
        "q_ann_ivf", "q_ann_lsh", "q_ann_pq", "q_ann_ivfpq", "q_semantic_dedup",
        "q_lsh_semantic_dedup", "q_dedup_clusters",
        "q_bpe_vocab", "q_bpe_segment",
        "q_lm_perplexity", "q_lm_quality_buckets",
        "q_quality_classifier", "q_brand_affinity", "q_state_reader",
        "q_ann_hnsw")]
    plain = [q for q in batch if q not in indexed]
    d_p, s_p = sum(dq[q] for q in plain), sum(sq[q] for q in plain)
    if indexed:
        a(f"| batch excl. artifact-backed ({len(indexed)}) | {len(plain)} | {d_p:.2f} | {s_p:.2f} | {s_p/d_p:.2f}x |")
    a(f"| streaming twins | {len(stream)} | {d_s:.2f} | {s_s:.2f} | {s_s/d_s:.2f}x |")
    # round-over-round comparability: the round-14 wm gate deliberately
    # pays 3 micro-batch floors against a 0.02 s batch-SQL twin; keep
    # the r13-set cut visible beside the current-set cut
    stream13 = [q for q in stream if q != "q_stream_stream_join_wm"]
    if len(stream13) != len(stream):
        d_s13 = sum(dq[q] for q in stream13)
        s_s13 = sum(sq[q] for q in stream13)
        a(f"| streaming twins, r13 set (excl. wm gate) | {len(stream13)} | {d_s13:.2f} | {s_s13:.2f} | {s_s13/d_s13:.2f}x |")
    a("")
    a("The artifact-backed row: those oracles replay full deterministic")
    a("training — quantizer Lloyd rounds, BPE merge induction, LM model")
    a("relations, connected-component closure — as chained CTEs on every")
    a("DuckDB run, while Spark's declared queries probe a persisted or")
    a("session-cached artifact (built once per corpus dir; bench pass 1")
    a("pays the build and the per-query min is the probe cost). That")
    a("asymmetry is the real deployment story — indexes, merge tables,")
    a("and cluster labels exist to be amortized — but the excl. row")
    a("shows the engine also meets the contract without it.")
    a("")
    a("The streaming rows time a full micro-batch pipeline per query")
    a("(checkpoint dir, state store, sink store, read-back) against a plain")
    a("SQL twin — fixed machinery a KV-serving deployment amortizes over a")
    a("running stream, not per query. The batch-only ratio is the")
    a("apples-to-apples plan-quality number; the common-suite ratio is the")
    a("letter-of-the-contract number. Both are published.")
    a("")
    spark_beats = sum(1 for q in common if sq[q] < dq[q])
    a(f"Spark outright beats DuckDB on {spark_beats} of {len(common)} queries —")
    a("notably the heavy dedup/text pipelines (the workloads the engine is")
    a("for): " + ", ".join(
        f"{q} ({sq[q]:.2f}s vs {dq[q]:.2f}s)"
        for q in sorted(common, key=lambda q: sq[q] / max(dq[q], 1e-4))[:4]) + ".")
    a("")
    a("The per-query floor dominates the rest: DuckDB answers a 2 ms")
    a("query in 2 ms; a Spark action costs ~0.15-0.3 s in scheduling,")
    a("codegen, and stage launch at ANY scale (SCALING.md's flat")
    a("sf0.001-to-sf0.01 columns). That floor amortizes to zero at the")
    a("100 TB design point; it is the whole story of the sub-second rows.")
    a("")
    a("## Per-query table (seconds, per-query min)")
    a("")
    a("| query | DuckDB | Spark | ratio |")
    a("|---|---|---|---|")
    for q in common:
        a(f"| {q} | {dq[q]:.3f} | {sq[q]:.3f} | {sq[q]/max(dq[q],1e-4):.2f}x |")
    if spark_only:
        a("")
        a("## Spark-only queries (no oracle — rows-only ledger, SURVEY §2.0.1)")
        a("")
        a("| query | Spark s |")
        a("|---|---|")
        for q in spark_only:
            a(f"| {q} | {sq[q]:.3f} |")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: common={len(common)} ratio={s_tot/d_tot:.2f}x "
          f"batch={s_b/d_b:.2f}x")


if __name__ == "__main__":
    main()
