#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

For each query dir under verify_out_dir, loads the Spark parquet result,
runs the matching oracle SQL from oracle_sql.json in DuckDB (with each
testdata parquet registered as a view by table name), sorts columns by
name + rows by all columns, and compares values cell-by-cell.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    import math, datetime, decimal
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = [tuple(canon(data[i][r]) for i in range(len(cols)))
            for r in range(tbl.num_rows)]
    return cols, sorted(rows, key=lambda t: tuple(str(x) for x in t))


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(qdir)
        if name not in oracles:
            status = "ok" if spark_tbl.num_rows > 0 else "EMPTY"
            print(f"rows-only  {name}: {spark_tbl.num_rows} rows {status}")
            n_noracle += 1
            continue
        try:
            duck_tbl = con.sql(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, srows = table_rows(spark_tbl)
        dcols, drows = table_rows(duck_tbl)
        if scols != dcols:
            print(f"FAIL  {name}: schema mismatch spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL  {name}: {len(bad)}/{len(srows)} rows differ; first @{i}:")
            print(f"      spark={a}")
            print(f"      duck ={b}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
