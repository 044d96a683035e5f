#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir with an entry in oracle_sql.json:
run the oracle SQL in DuckDB over views of the sf parquet tables, load
the Spark parquet result, sort columns by name, sort rows, and compare
values exactly. Reports per-query: rows / schema / values match.

Dev tool only — NOT part of the library (driver-side python env).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0; repr for full precision
        return repr(v + 0.0)
    return str(v)


# DuckDB logical types that hash identically driver-side (the driver
# reads both results through the same value encoding, so only the
# VALUE width class matters, not e.g. INT vs BIGINT promotion — but
# HUGEINT/DECIMAL do NOT encode like BIGINT/DOUBLE and break the hash,
# which is exactly what this strict compare must catch locally).
_INT_OK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
           "UTINYINT", "USMALLINT", "UINTEGER"}


def type_class(t):
    t = str(t)
    if t in _INT_OK:
        return "int64"
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UBIGINT", "UHUGEINT"):
        return t  # distinct classes: these hash-differ from int64/double
    return t


def df_rows(con, sql):
    cur = con.sql(sql)
    cols = list(cur.columns)
    types = [type_class(t) for t in cur.types]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    types_sorted = [types[i] for i in order]
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, types_sorted, out


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocols, otypes, orows = df_rows(con, sql)
            scols, stypes, srows = df_rows(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            schema_ok = ocols == scols
            types_ok = otypes == stypes
            rows_ok = len(orows) == len(srows)
            vals_ok = orows == srows
            if schema_ok and types_ok and rows_ok and vals_ok:
                print(f"PASS  {name}  ({len(orows)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL  {name}: schema={schema_ok} types={types_ok} "
                      f"rows={rows_ok}"
                      f"({len(orows)} vs {len(srows)}) values={vals_ok}")
                if not schema_ok:
                    print(f"      oracle cols: {ocols}\n      spark  cols: {scols}")
                if schema_ok and not types_ok:
                    for c, a, b in zip(ocols, otypes, stypes):
                        if a != b:
                            print(f"      col {c}: oracle type {a} vs spark {b}")
                if schema_ok and rows_ok and not vals_ok:
                    for i, (a, b) in enumerate(zip(orows, srows)):
                        if a != b:
                            print(f"      first diff row {i}:\n        oracle: {a}\n        spark : {b}")
                            break
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
