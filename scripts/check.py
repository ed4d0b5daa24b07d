#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

For each query in <verifyOutDir>/oracle_sql.json:
  - run the oracle SQL in DuckDB with views named after the parquet tables
  - read the Spark result parquet from <verifyOutDir>/<name>/
  - sort columns by name, compare row-by-row (exact), report PASS/FAIL
"""
import json
import sys
import glob

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # Normalize to stable comparable form, mirroring the driver's exact
    # hash-of-values compare AFTER pandas materialization: both sides go
    # through fetchdf(), so dtype drift (DuckDB HUGEINT -> float64 "1.0"
    # vs Spark int64 "1") fails here exactly as it fails in the driver.
    # Raw array/map cells are a hard FAIL — the driver's pandas
    # sort_values crashes on ndarray cells, so local must fail too.
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise TypeError(
            f"raw array/map cell ({type(v).__name__}) — driver comparator "
            "would crash; stringify the column in query + oracle")
    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if v != v:
            return "NULL"
        if v == 0:
            v = 0.0  # collapse -0.0
        return repr(v)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return str(v)


def frame(con, sql):
    # fetchdf(), NOT fetchall(): the driver compares pandas frames, and
    # pandas materialization is where dtype drift appears (HUGEINT ->
    # float64, NULL-able int -> float64). fetchall() returns Python ints
    # and masked round-2's q_sessionize_batch red row.
    df = con.execute(sql).fetchdf()
    df = df[sorted(df.columns)]
    cols = list(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            ocols, orows = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            scols, srows = frame(
                con, f"SELECT * FROM read_parquet('{spark_files[0]}')")
        except Exception as e:
            print(f"FAIL {name}: spark result error: {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [(i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o]
        if bad:
            i, s, o = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; "
                  f"first at {i}:\n  cols : {scols}\n  spark: {s}\n  oracle:{o}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
