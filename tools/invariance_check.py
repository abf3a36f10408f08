#!/usr/bin/env python3
"""Full-surface parallelism-invariance sweep (round-16 lead item).

Usage:
  python3 tools/invariance_check.py <sfDir> [--cpus 7] [--out INVARIANCE.json]
      [--ref-dir DIR] [--alt-dir DIR] [--keep]

Runs `graft.Verify` over the ENTIRE gate surface twice — once at the
standard parallelism (local[32], shuffle.partitions=32) and once at a
coprime alternate (default SPARK_GRAFT_CPUS=7) — and bit-compares every
gate's dump (columns sorted by name, rows sorted, NaN==NaN, dtype-strict:
the check_correctness cell discipline). At 100 TB nothing runs at 32
shuffle partitions, so every gate's determinism claim must be a
SURFACE-WIDE fact under AQE/parallelism changes, not a per-op spec
anecdote; the round-15 judge probe (5 gates at CPUS=7) is here promoted
to all gates.

Pass --ref-dir to reuse an existing standard-parallelism dump (e.g. the
round's verify output) instead of re-running it. Dumps land under
/tmp/invariance_{ref,alt} unless overridden; --keep retains them.

Artifact (written to --out, default REPO/INVARIANCE.json):
  {"sf": ..., "cpus": [32, 7], "total": N, "identical": N,
   "mismatched": [...], "missing": [...], "gates": {name: true/false}}
Exit 0 iff every gate is present in both dumps and identical.
"""
import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent))
from check_correctness import cells_equal, typed_rows_of  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
ADD_OPENS = [
    f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar"]]


def run_verify(sf_dir, out_dir, cpus=None, only=()):
    env = dict(os.environ)
    if cpus is not None:
        env["SPARK_GRAFT_CPUS"] = str(cpus)
    else:
        env.pop("SPARK_GRAFT_CPUS", None)
    cmd = ["java", "-Xmx24g", *ADD_OPENS,
           "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
           "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
           "graft.Verify", sf_dir, str(out_dir), *only]
    label = f"cpus={cpus or 32}"
    print(f"[invariance] graft.Verify {label} -> {out_dir}", flush=True)
    r = subprocess.run(cmd, env=env, stdout=subprocess.DEVNULL,
                       stderr=subprocess.PIPE, text=True)
    failures = [ln for ln in (r.stderr or "").splitlines()
                if ln.startswith("[verify]")]
    for ln in failures:
        print(f"[invariance] {label}: {ln}", flush=True)
    if r.returncode != 0:
        tail = "\n".join((r.stderr or "").splitlines()[-15:])
        sys.exit(f"[invariance] Verify {label} rc={r.returncode}\n{tail}")


def compare(ref_dir, alt_dir):
    con = duckdb.connect()
    con.execute("SET threads=8")
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    ref_gates = {p.name for p in Path(ref_dir).iterdir()
                 if p.is_dir()}
    alt_gates = {p.name for p in Path(alt_dir).iterdir()
                 if p.is_dir()}
    gates, mismatched, missing = {}, [], []
    for name in sorted(ref_gates | alt_gates):
        if name not in ref_gates or name not in alt_gates:
            missing.append(name)
            gates[name] = False
            continue
        try:
            rc, rt, rr = typed_rows_of(
                con, f"SELECT * FROM read_parquet('{ref_dir}/{name}/*.parquet')")
            ac, at, ar = typed_rows_of(
                con, f"SELECT * FROM read_parquet('{alt_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"MISMATCH {name}: read error {str(e)[:160]}")
            mismatched.append(name)
            gates[name] = False
            continue
        same = (rc == ac and rt == at and len(rr) == len(ar) and all(
            cells_equal(a, b) for ra, aa in zip(rr, ar)
            for a, b in zip(ra, aa)))
        gates[name] = same
        if not same:
            detail = ("columns" if rc != ac else
                      "dtypes" if rt != at else
                      f"rows {len(rr)} vs {len(ar)}" if len(rr) != len(ar)
                      else "values")
            print(f"MISMATCH {name}: {detail}")
            mismatched.append(name)
    return gates, mismatched, missing


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    sf_dir = args[0]
    opts = dict(zip(args[1::2], args[2::2]))
    cpus = int(opts.get("--cpus", 7))
    out = Path(opts.get("--out", REPO / "INVARIANCE.json"))
    keep = "--keep" in args
    ref_dir = Path(opts.get("--ref-dir", "/tmp/invariance_ref"))
    alt_dir = Path(opts.get("--alt-dir", "/tmp/invariance_alt"))
    # --only a,b,c: subset sweep for fast adjudication of a flagged gate
    # (a subset artifact is tagged and never a round-close input)
    only = tuple(x for x in opts.get("--only", "").split(",") if x)

    if "--ref-dir" not in opts or not ref_dir.exists():
        shutil.rmtree(ref_dir, ignore_errors=True)
        run_verify(sf_dir, ref_dir, only=only)
    else:
        print(f"[invariance] reusing ref dump {ref_dir}", flush=True)
    shutil.rmtree(alt_dir, ignore_errors=True)
    run_verify(sf_dir, alt_dir, cpus=cpus, only=only)

    gates, mismatched, missing = compare(ref_dir, alt_dir)
    identical = sum(gates.values())
    artifact = {
        "sf": sf_dir, "cpus": [32, cpus], "total": len(gates),
        "identical": identical, "mismatched": sorted(mismatched),
        "missing": sorted(missing), "gates": gates,
    }
    if only:
        artifact["only"] = sorted(only)  # partial sweep — not close-grade
    out.write_text(json.dumps(artifact, indent=1, sort_keys=True) + "\n")
    print(f"[invariance] {identical}/{len(gates)} gates dump-identical at "
          f"cpus 32 vs {cpus} -> {out}", flush=True)
    if not keep:
        shutil.rmtree(alt_dir, ignore_errors=True)
    ok = identical == len(gates) and len(gates) > 0
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
