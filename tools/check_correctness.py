#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
paired oracle SQL from oracle_sql.json in DuckDB (views named after the
parquet tables in <sfDir>), and compares: columns sorted by name, rows sorted,
exact value equality (tiny float tolerance only for reporting — a mismatch
beyond 1e-12 relative is a FAIL, matching a hash-style compare).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def cells_equal(a, b):
    # STRICT bit-exact compare — the driver's gate hashes values, so any
    # tolerance here would hide failures the driver will catch.
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, float) != isinstance(b, float):
        return False  # dtype mismatch counts as failure
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            scols, srows = rows_of(
                con, f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            ocols, orows = rows_of(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} != {len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            if not all(cells_equal(a, b) for a, b in zip(sr, orow)):
                bad = (i, sr, orow)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark {bad[1]}\n  duck  {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
