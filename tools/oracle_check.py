#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each <sfDir>/<table>.parquet as a DuckDB view, runs every oracle SQL, and
compares against the Spark result parquet dumped by Verify: row count,
column names (sorted), and cell-by-cell values (NaN-safe, order as
written). Exit code 1 if any query mismatches.

Driver-side tooling only (duckdb/pandas are NOT dependencies of the
engine itself).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Rows as list of tuples in sorted-column order."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(r[i] for i in order) for r in rows], [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    # A filtered Verify run (SPARK_GRAFT_ONLY) dumps a subset but writes
    # the FULL oracle_sql.json; check dir existence BEFORE running the
    # oracle SQL — some oracles (q32's O(n^2) pair join) are hours at
    # sf0.1 and must not run when their result wasn't even dumped.
    import os
    dumped = {n for n in oracle if os.path.isdir(f"{out_dir}/{n}")}
    for name in sorted(dumped):
        sql = oracle[name]
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        wr, wc = canon(want_rows, want_cols)
        gr, gc = canon(got_rows, got_cols)
        if wc != gc:
            print(f"FAIL {name}: columns spark={gc} oracle={wc}")
            n_bad += 1
            continue
        if len(wr) != len(gr):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(wr)}")
            n_bad += 1
            continue
        bad = None
        for i, (w, g) in enumerate(zip(sorted(map(repr, wr)),
                                       sorted(map(repr, gr)))):
            if w != g:
                bad = (i, g, w)
                break
        # order-sensitive pass too (queries promise a total ORDER BY)
        obad = None
        for i, (w, g) in enumerate(zip(wr, gr)):
            if not all(eq(x, y) for x, y in zip(w, g)):
                obad = (i, g, w)
                break
        if bad:
            print(f"FAIL {name}: value mismatch at sorted row {bad[0]}:\n"
                  f"  spark={bad[1]}\n  oracle={bad[2]}")
            n_bad += 1
        elif obad:
            # The driver's real gate is order-sensitive; a row-order
            # mismatch here must fail locally too or green is a lie.
            print(f"FAIL {name}: same multiset, row ORDER differs at "
                  f"{obad[0]}: spark={obad[1]} oracle={obad[2]}")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(gr)} rows, {len(gc)} cols")
    import os
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    no_oracle = sorted(dirs - set(oracle))
    no_result = sorted(set(oracle) - dirs)
    if no_oracle:
        print(f"NOTE result dirs without oracle sql: {no_oracle}")
    if no_result:
        print(f"FAIL oracle entries without result dir: {no_result}")
        n_bad += len(no_result)
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} oracle queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
