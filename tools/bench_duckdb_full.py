#!/usr/bin/env python3
"""Full-suite DuckDB baseline (round-8 verdict #1).

Runs EVERY SparkEntry.oracleSql string in DuckDB over the sf parquet
tables with the BASELINE.md protocol (DuckDB 1.0.0, threads=4, warm OS
cache), N passes interleaved pass-major (same rationale as Bench.scala:
a load spike shorter than a pass poisons at most one sample per query),
and writes a JSON artifact with per-query min/median seconds.

Usage: python3 tools/bench_duckdb_full.py <sfDir> <oracle_sql.json> <out.json> [passes]

Dev/measurement tool only — NOT part of the library (driver-side python
env). The committed artifact is BASELINE_full.md, generated from the
JSON by the builder.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    with open(oracle_path) as f:
        oracles = json.load(f)
    con = duckdb.connect(config={"threads": 4})
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # CPU warm-up (round 12): Bench.scala warms the host's
    # frequency-ramping vCPUs with an all-core burn before timing;
    # DuckDB must get the same treatment or its multi-second CPU-bound
    # oracles measure the ramp, not the query (observed +20% on the
    # minhash/chained-CTE family from a cold host). Also touches every
    # view once so the OS page cache is warm like the Spark side.
    con.sql("SELECT sum(i % 97) FROM range(2000000000) t(i)").fetchall()
    for t in TABLES:
        con.sql(f"SELECT count(*) FROM {t}").fetchall()
    names = sorted(oracles)
    times = {n: [] for n in names}
    failed = {}
    for p in range(passes):
        for n in names:
            if n in failed:
                continue
            t0 = time.perf_counter()
            try:
                con.sql(oracles[n]).fetchall()
                times[n].append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 - record and continue
                failed[n] = str(e).split("\n")[0]
    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2
    result = {
        "sf": sf_dir,
        "passes": passes,
        "engine": f"duckdb {duckdb.__version__} threads=4",
        "agg": "per-query min (median cross-check)",
        "n_queries": len(names),
        "queries": {n: round(min(ts), 4) for n, ts in times.items() if ts},
        "queries_median": {n: round(med(ts), 4) for n, ts in times.items() if ts},
        "total": round(sum(min(ts) for ts in times.values() if ts), 3),
        "total_median": round(sum(med(ts) for ts in times.values() if ts), 3),
        "failed": failed,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("sf", "n_queries", "total", "total_median", "failed")}))


if __name__ == "__main__":
    main()
