#!/usr/bin/env python3
"""Dev-only mirror of the driver's t2 correctness gate: run DuckDB on each
SparkEntry.oracleSql entry over the same parquet tables and compare to the
parquet the graft.Verify dump wrote. Not part of the shipped library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    # sort columns by name, then rows; round floats for stable compare
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(r):
        out = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            out.append((v is None, str(type(v)), str(v)))
        return out

    return sorted([key(r) for r in rows])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # a subset Verify run (extra name args) dumps only some queries —
        # absent dump dir = not run, not a failure
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            # LINT (round-9/round-11 bug family): DuckDB sum() yields
            # HUGEINT, which the driver's arrow fetch renders as float64
            # ("964.0") while Spark writes int64 ("964") — the local
            # fetchall() hides this (python int), so catch it by TYPE
            # before the value compare. Any HUGEINT output column must be
            # CAST (usually AS BIGINT) in the oracle SQL.
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
            huge = [c for c, t, *_ in desc if "HUGEINT" in str(t).upper()]
            if huge:
                print(f"FAIL {name}: LINT uncast HUGEINT column(s) {huge} — wrap in CAST(... AS BIGINT)")
                n_fail += 1
                continue
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: ERROR {e}")
            n_fail += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
            n_fail += 1
            continue
        ce, cg = canon(exp_rows, exp_cols), canon(got_rows, got_cols)
        if len(ce) != len(cg):
            print(f"FAIL {name}: rows oracle={len(ce)} spark={len(cg)}")
            n_fail += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(ce, cg)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(ce)} rows differ; first at {i}:\n  oracle={ce[i]}\n  spark ={cg[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ce)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} not dumped ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
