#!/usr/bin/env python3
"""Strict driver-mimic oracle compare.

Unlike check_oracle.py (which reads BOTH sides through DuckDB and
collapses -0.0/NaN), this mimics what the driver's harness appears to
do per CORRECTNESS_r01.json: load the Spark result with
pandas.read_parquet (pyarrow), the oracle with duckdb .df(), sort
columns by name, sort rows, then compare cell values EXACTLY on their
python repr — no float normalization at all. A query that passes here
should hash-match on the driver.

Usage: python3 tools/check_driver.py <sfDir> <verifyOutDir> [query ...]
"""
import glob, json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # DATE columns: DuckDB .df() surfaces pandas Timestamp, pyarrow
    # read_parquet surfaces datetime.date — same value, different repr.
    # The real driver compares these equal (q_attribution et al. are
    # green with DATE outputs), so fold both to the ISO day string
    # before the repr compare. Timestamps keep full precision.
    import datetime
    import pandas as pd
    # NULL dates: DuckDB .df() surfaces pd.NaT (which IS a
    # datetime.datetime subtype but raises on .time()), pyarrow
    # surfaces None — fold both to None's repr
    if v is pd.NaT:
        return repr(None)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time() and v.tzinfo is None:
            return repr(v.date().isoformat())
        return repr(v.isoformat(sep=" "))
    if isinstance(v, datetime.date):
        return repr(v.isoformat())
    return repr(v)


def cells(df):
    df = df[sorted(df.columns)]
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
    return list(df.columns), rows


def main(sf_dir, out_dir, only):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            odf = con.sql(sql).df()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            ocols, orows = cells(odf)
            scols, srows = cells(sdf)
            schema_ok = ocols == scols
            rows_ok = len(orows) == len(srows)
            vals_ok = orows == srows
            if schema_ok and rows_ok and vals_ok:
                print(f"PASS  {name}  ({len(orows)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL  {name}: schema={schema_ok} rows={rows_ok} values={vals_ok}")
                if not schema_ok:
                    print(f"      oracle cols: {ocols}\n      spark  cols: {scols}")
                elif rows_ok:
                    shown = 0
                    for i, (a, b) in enumerate(zip(orows, srows)):
                        if a != b and shown < 3:
                            shown += 1
                            for j, (x, y) in enumerate(zip(a, b)):
                                if x != y:
                                    print(f"      row {i} col {ocols[j]}: oracle={x} spark={y}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
