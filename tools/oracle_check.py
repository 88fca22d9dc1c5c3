#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sf_dir> <verify_out_dir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the oracle SQL in DuckDB over views registered for each testdata
table, sort columns by name, sort rows, and compare row counts +
per-cell values (exact for ints/strings, 1e-9 rel tol for floats).
"""
import decimal
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        spark_tbl = pq.read_table([os.path.join(d, f) for f in files])
        if name not in oracle:
            print(f"SKIP  {name}: rows-only ({spark_tbl.num_rows} rows)")
            continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL  {name}: rows spark={spark_tbl.num_rows} "
                  f"duck={duck.num_rows}")
            n_fail += 1
            continue
        # Type-aware, None-safe sort key. str(v) keys sorted floats
        # lexicographically ('10.0' < '2.0'), so two engines whose
        # values differ below the comparison tolerance could sort rows
        # into different relative orders and misalign the zip-compare.
        # Numbers sort numerically (floats rounded to ~the 1e-9 rel
        # tolerance, ints kept exact — Python compares int/float/Decimal
        # cross-type), NaN sorts between numbers and strings.
        def cell_key(v):
            if v is None:
                return (0, 0, 0, "")
            if isinstance(v, bool):
                return (1, 3, 0, str(v))
            if isinstance(v, float):
                if math.isnan(v):
                    return (1, 2, 0, "")
                return (1, 1, float(f"{v:.9e}"), "")
            if isinstance(v, (int, decimal.Decimal)):
                return (1, 1, v, "")
            return (1, 3, 0, str(v))

        def row_key(r):
            return tuple(cell_key(v) for v in r)

        s_rows = sorted(
            (tuple(norm(spark_tbl.column(c)[i].as_py()) for c in s_cols)
             for i in range(spark_tbl.num_rows)), key=row_key)
        d_rows = sorted(
            (tuple(norm(duck.column(c)[i].as_py()) for c in d_cols)
             for i in range(duck.num_rows)), key=row_key)
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for c, (sv, dv) in zip(s_cols, zip(sr, dr)):
                if not cells_equal(sv, dv):
                    bad = (i, c, sv, dv)
                    break
            if bad:
                break
        if bad:
            i, c, sv, dv = bad
            print(f"FAIL  {name}: row {i} col {c}: spark={sv!r} duck={dv!r}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({spark_tbl.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
