#!/usr/bin/env python3
"""Sharded bench sweep: the full gate surface timed across N FRESH JVMs.

Usage:
  python3 tools/bench_sharded.py <sfDir> <out.json> [nShards=4]

Why: the round-14 SCALE.md addendum documented that any single ~700 s
310-gate bench JVM shows 1-3 rotating heavy rows at 2-3.5x their
isolated time (in-process state — broadcast/shuffle residue, GC timing;
NOT contention, NOT gate regressions), forcing a per-row fresh-JVM
adjudication protocol. Sharding the sweep bounds each JVM's life to
~1/N of the surface, which is the same structural fix sweep_check.py
applied to the correctness sweep — heavy rows then land inside their
recorded bands and the protocol narrative is unnecessary.

Each shard is a fresh `graft.Bench` JVM timing a contiguous slice of the
sorted gate list (contiguous, not round-robin: name-prefix families share
content-keyed serving caches, so slicing keeps one family's cache reuse
inside one JVM). Every shard runs the FULL warmup battery off-clock —
redundant across shards, but warm coverage per shard is what makes the
measured rows comparable to the single-JVM artifact's.

Output: one merged artifact in the bench_last.json schema plus
  "shards": N, "shard_totals": [...], "shard_warmups": [...]
with `value` = sum of per-query seconds (same meaning as single-JVM),
`warmups` = per-family MAX seconds across shards (the conservative input
for tools/warm_check.py), and `host` busy fractions time-weighted across
the shard windows.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ADD_OPENS = [
    f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar"]]


def run_shard(sf_dir, i, n, out_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_SHARD"] = f"{i}/{n}"
    env["SPARK_GRAFT_BENCH_OUT"] = str(out_path)
    cmd = ["java", "-Xmx24g", *ADD_OPENS,
           "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
           "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
           "graft.Bench"]
    print(f"[bench-sharded] shard {i + 1}/{n} starting", flush=True)
    # keep stderr: it carries the per-gate "FAILED:" lines and the warmup
    # battery's failure messages — without it a failed warmup's only trace
    # is the ok=false flag in the artifact (and an ADVICE-flagged merge bug
    # once dropped even that)
    r = subprocess.run(cmd, env=env, stdout=subprocess.DEVNULL,
                       stderr=subprocess.PIPE, text=True)
    if r.returncode != 0:
        tail = "\n".join(r.stderr.splitlines()[-20:]) if r.stderr else ""
        print(f"[bench-sharded] shard {i + 1}/{n} exited rc={r.returncode} "
              f"(failed gates are in the artifact)\n{tail}", flush=True)
    else:
        for ln in (r.stderr or "").splitlines():
            if "FAILED" in ln:
                print(f"[bench-sharded] shard {i + 1}/{n} stderr: {ln}",
                      flush=True)
    return json.loads(Path(out_path).read_text())


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir, out_file = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    shards = []
    for i in range(n):
        p = Path(f"/tmp/bench_shard_{i}.json")
        shards.append(run_shard(sf_dir, i, n, p))

    queries, failed = {}, []
    warm_max = {}
    for s in shards:
        queries.update(s.get("queries", {}))
        failed += s.get("failed", [])
        for fam, rec in s.get("warmups", {}).items():
            # ok is STICKY-false and sec is a true max: a later shard's
            # ok=true/larger-sec record must never wash out an earlier
            # shard's failure (warm_check.py rule 2 trusts merged ok, so a
            # washed-out failure would bless on-clock first-compile JIT)
            cur = warm_max.get(fam)
            merged_ok = (cur is None or cur["ok"]) and bool(rec["ok"])
            sec = max(rec["sec"], cur["sec"] if cur else 0.0)
            warm_max[fam] = {"sec": sec, "ok": merged_ok}
    total = sum(queries.values())
    # time-weighted host fractions: weight each shard's busy% by its
    # measured seconds (the windows are disjoint in time)
    wsum = sum(s["value"] for s in shards) or 1.0
    busy = sum(s["host"]["busy_pct"] * s["value"] for s in shards) / wsum
    other = sum(
        s["host"]["other_busy_pct"] * s["value"] for s in shards) / wsum
    merged = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": dict(sorted(queries.items())),
        "failed": sorted(failed),
        "warmups": warm_max,
        "host": {
            "load_before": shards[0]["host"]["load_before"],
            "load_after": shards[-1]["host"]["load_after"],
            "busy_pct": round(busy, 1),
            "other_busy_pct": round(other, 1),
        },
        "sf": sf_dir,
        "shards": n,
        "shard_totals": [round(s["value"], 2) for s in shards],
        "shard_warmups": [
            {k: v["sec"] for k, v in s.get("warmups", {}).items()}
            for s in shards],
    }
    Path(out_file).write_text(json.dumps(merged) + "\n")
    print(f"[bench-sharded] {len(queries)} gates across {n} JVMs, "
          f"total {total:.1f}s (shards: {merged['shard_totals']}), "
          f"failed={sorted(failed)}, other_busy {other:.1f}% -> {out_file}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
