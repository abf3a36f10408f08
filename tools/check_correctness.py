#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate — DTYPE-AWARE.

Usage:
  python3 tools/check_correctness.py <sfDir> <verifyOutDir>   # full compare
  python3 tools/check_correctness.py --lint <sfDir> <oracle_sql.json>

Full compare: reads each <verifyOutDir>/<name>/ parquet (written by
graft.Verify), runs the paired oracle SQL from oracle_sql.json in DuckDB
(views named after the parquet tables in <sfDir>), and compares
  1. LOGICAL TYPES — the DuckDB relation types of the oracle output vs the
     spark parquet output, position-matched after sorting columns by name.
     The driver's hasher is dtype-sensitive (round-11 verdict: 5 gates were
     value-exact but hashed red because one oracle column was HUGEINT), so
     two numerically-equal columns with different logical types are a FAIL
     here exactly as they are there.
  2. VALUES — columns sorted by name, rows sorted, exact equality (NaN==NaN;
     float-vs-int dtype divergence is a FAIL).

Both modes additionally LINT every oracle: each output column's DuckDB type
must be in the portable set {BIGINT, DOUBLE, VARCHAR, BOOLEAN, DATE,
TIMESTAMP and array/struct compositions thereof}. HUGEINT / DECIMAL /
unsigned / INTEGER outputs are exactly the class of silent divergence the
driver catches and a dtype-blind local compare cannot — lint them out before
they reach the driver. The lint is static (DuckDB binds types without
executing), so --lint runs in seconds with no spark output needed.
"""
import json
import math
import re
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types a parquet-read Spark result can NEVER surface as in DuckDB: an
# oracle output column of one of these is guaranteed to dtype-mismatch the
# spark side under the driver's dtype-sensitive hasher, no matter the
# values. (round-11 verdict: 5 gates were value-exact but hashed red
# because sum(BIGINT) // x silently made the oracle column HUGEINT.)
# INTEGER/SMALLINT etc. are NOT banned here — they are legal when the spark
# column is the same width; the full-compare path checks that exactly.
_BANNED = re.compile(
    r"HUGEINT|UHUGEINT|DECIMAL|UINTEGER|UBIGINT|USMALLINT|UTINYINT"
    r"|\bTIME\b|INTERVAL|TIMESTAMP WITH TIME ZONE|TIMESTAMP_NS|TIMESTAMP_MS"
    r"|TIMESTAMP_S|\bBIT\b|\bUUID\b|\bENUM\b")


def type_portable(t: str) -> bool:
    """True unless the type (or any nested element type) is in the banned
    set — composites are scanned textually, which is safe because the
    banned names cannot appear inside identifiers DuckDB quotes."""
    return _BANNED.search(t) is None


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rel_of(con, sql):
    """Bind (not execute) sql; returns the DuckDB relation."""
    return con.sql(sql)


def typed_rows_of(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return ([cols[i] for i in order], [types[i] for i in order],
            sorted(out, key=repr))


def cells_equal(a, b):
    # STRICT bit-exact compare — the driver's gate hashes values, so any
    # tolerance here would hide failures the driver will catch.
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, float) != isinstance(b, float):
        return False  # dtype mismatch counts as failure
    return a == b


def connect_views(sf_dir):
    con = duckdb.connect()
    # bound the oracle engine: at the bigger SFs (the sf1 sweep) the
    # default all-cores + 80%-of-RAM settings OOM'd when several checker
    # processes (or a concurrent Spark JVM) shared the host — a capped,
    # spill-enabled DuckDB is slower but never falls over mid-sweep
    con.execute("SET threads=8")
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # spark-written multi-part table (scaled replicas)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def lint_oracles(con, oracle):
    """Static type lint of every oracle: returns {name: [bad 'col TYPE']}."""
    bad = {}
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            offend = [f"{c} {t}" for c, t in
                      zip(rel.columns, (str(x) for x in rel.types))
                      if not type_portable(str(t))]
        except Exception as e:  # a binding error is itself a lint failure
            offend = [f"<bind error: {str(e)[:160]}>"]
        if offend:
            bad[name] = offend
    return bad


def main():
    if sys.argv[1] == "--lint":
        sf_dir, oracle_path = sys.argv[2], sys.argv[3]
        con = connect_views(sf_dir)
        oracle = json.loads(Path(oracle_path).read_text())
        bad = lint_oracles(con, oracle)
        for name, offend in bad.items():
            print(f"LINT {name}: non-portable oracle output: {offend}")
        print(f"\nlint: {len(oracle) - len(bad)} clean, {len(bad)} flagged "
              f"of {len(oracle)}")
        sys.exit(1 if bad else 0)

    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional extra args: restrict to these gate names — lets a driver
    # SHARD a big-SF run across processes so one gate's multi-million-row
    # fetch can't exhaust the process for every gate after it (the sf1
    # sweep OOM'd the single-process run after the 14M-row BPE results)
    only = set(sys.argv[3:])
    con = connect_views(sf_dir)
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}

    lint_bad = lint_oracles(con, oracle)
    for name, offend in lint_bad.items():
        print(f"LINT {name}: non-portable oracle output: {offend}")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            scols, stypes, srows = typed_rows_of(
                con, f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            ocols, otypes, orows = typed_rows_of(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            n_fail += 1
            continue
        if stypes != otypes:
            print(f"FAIL {name}: dtypes spark={stypes} oracle={otypes}")
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
    print(f"\n{n_pass} passed, {n_fail} failed, {len(lint_bad)} lint-flagged")
    sys.exit(1 if (n_fail or lint_bad) else 0)


if __name__ == "__main__":
    main()
