#!/usr/bin/env python3
"""Sharded driver-format correctness sweep over a graft.Verify output dir.

Usage:
  python3 tools/sweep_check.py <sfDir> <verifyOutDir> <out.json> [shardSize] [parallel]

Splits the gate list into shards of `shardSize` (default 24) and runs each
shard in a FRESH subprocess (`--shard-worker` mode below), merging the
per-gate results into one driver-format JSON:

  {"q_x": {"rows_match": bool, "schema_match": bool, "hash_match": bool,
           "spark_rows": int|null, "oracle_rows": int|null, "err": str|null}}

Why subprocess-per-shard: the single-process sf1 run OOM'd — DuckDB +
multi-million-row fetchall never return freed arenas to the OS, so by the
~200th gate the resident set exceeded the host. A fresh process per shard
caps the blast radius of any one gate's result size, and `parallel` (default
3) shards run concurrently, each with DuckDB capped at threads=8 /
memory_limit=24GB / spill dir (set in check_correctness.connect_views).

MEMORY-AWARE SCHEDULING (round 16): `parallel` is now a cap, not the
schedule — each gate gets a memory estimate (base cost + the gate's spark
dump size as a fetchall proxy + surcharges for the known-heavy oracle
classes: recursive-CTE and window-replay SQL), a shard's cost is its max
gate estimate (workers run their gates sequentially), and a new shard
launches only while the SUM of running shard costs fits the host budget
(env SWEEP_MEM_BUDGET_GB, default 0.75 x MemAvailable). The round-15 sf1
sweep lost 29 gates to rc=-9 with 3 workers x 24 GB racing the same
window replays; budgeted admission makes the retry pass a safety net that
should never fire instead of the plan.

Semantics per gate mirror the driver's t2 gate exactly (via the shared
typed_rows_of / cells_equal in check_correctness.py):
  schema_match = column names AND DuckDB logical types equal
  rows_match   = row counts equal
  hash_match   = every cell bit-exact (NaN==NaN; dtype divergence fails)
"""
import json
import os
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))


def worker(sf_dir, out_dir, names):
    import check_correctness as cc
    con = cc.connect_views(sf_dir)
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    res = {}
    for name in names:
        ent = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        res[name] = ent
        qdir = Path(out_dir) / name
        if name not in oracle:
            ent["err"] = "no oracle sql"
            continue
        if not qdir.exists():
            ent["err"] = "no spark output"
            continue
        try:
            scols, stypes, srows = cc.typed_rows_of(
                con, f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            ocols, otypes, orows = cc.typed_rows_of(con, oracle[name])
        except Exception as e:
            ent["err"] = str(e)[:300]
            continue
        ent["spark_rows"] = len(srows)
        ent["oracle_rows"] = len(orows)
        ent["rows_match"] = len(srows) == len(orows)
        ent["schema_match"] = scols == ocols and stypes == otypes
        if not ent["schema_match"]:
            ent["err"] = f"schema spark={list(zip(scols, stypes))} oracle={list(zip(ocols, otypes))}"[:400]
            continue
        if not ent["rows_match"]:
            continue
        ok = True
        for sr, orow in zip(srows, orows):
            if not all(cc.cells_equal(a, b) for a, b in zip(sr, orow)):
                ok = False
                ent["err"] = f"cell mismatch spark={sr} oracle={orow}"[:400]
                break
        ent["hash_match"] = ok
    return res


def main():
    if sys.argv[1] == "--shard-worker":
        sf_dir, out_dir, out_json = sys.argv[2], sys.argv[3], sys.argv[4]
        names = sys.argv[5:]
        Path(out_json).write_text(json.dumps(worker(sf_dir, out_dir, names)))
        return

    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    shard_size = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    parallel = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    names = sorted(oracle)

    # --- per-gate memory estimate (GB) -----------------------------------
    # fetchall proxy: the gate's spark parquet dump size (compressed, so
    # scaled up hard), plus surcharges for the oracle-SQL classes that
    # spike DuckDB's working set independent of result size
    def dump_mb(name):
        qdir = Path(out_dir) / name
        if not qdir.is_dir():
            return 0.0
        return sum(f.stat().st_size for f in qdir.glob("*.parquet")) / 1e6

    def est_gb(name):
        sql = oracle[name]
        g = 6.0 + 0.15 * dump_mb(name)  # ~15 GB per 100 MB of dump
        if "RECURSIVE" in sql:
            g += 24.0  # recursive CTE: working tables + per-row state
        if sql.count("OVER (") + sql.count("OVER(") >= 3:
            g += 12.0  # window-replay class: multiple full-frame sorts
        # ceiling = DuckDB's 24 GB arena cap + python fetchall overhead:
        # the first sf1 run's worst worker measured 28 GB RSS, so
        # estimates above ~36 GB are fiction that only serializes the
        # sweep (two capped heavies fit a 90 GB host side by side)
        return min(g, 36.0)

    est = {n: est_gb(n) for n in names}

    def mem_budget_gb():
        envv = os.environ.get("SWEEP_MEM_BUDGET_GB")
        if envv:
            return float(envv)
        avail_kb = 0
        for line in Path("/proc/meminfo").read_text().splitlines():
            if line.startswith("MemAvailable:"):
                avail_kb = int(line.split()[1])
                break
        return max(32.0, avail_kb / 1e6 * 0.75)

    budget = mem_budget_gb()

    # shards: heaviest gates first into SMALL shards so a single worker
    # never strings several heavy oracles through one DuckDB arena; the
    # light tail keeps the wide default. Worker peak ~= max gate in its
    # shard (gates run sequentially) + a retention pad.
    ordered = sorted(names, key=lambda n: -est[n])
    heavy = [n for n in ordered if est[n] > 12.0]
    light = sorted(n for n in ordered if est[n] <= 12.0)
    # heavy shards of TWO: est-sorted grouping strings same-class
    # multi-minute window replays through one worker SEQUENTIALLY, and a
    # 4-pack of them overran the per-shard timeout on the first sf1 run
    shards = [heavy[i:i + 2] for i in range(0, len(heavy), 2)]
    shards += [light[i:i + shard_size]
               for i in range(0, len(light), shard_size)]
    shard_cost = [max(est[n] for n in s) + 4.0 for s in shards]
    print(f"[sweep] {len(names)} gates, {len(heavy)} heavy, "
          f"{len(shards)} shards, host budget {budget:.0f} GB", flush=True)

    tmpdir = Path(out_json).parent / "sweep_shards"
    tmpdir.mkdir(parents=True, exist_ok=True)
    # clear stale shard files: a crashed worker + a same-named leftover
    # from a previous sweep would otherwise merge the OLD results
    for f in tmpdir.glob("*.json"):
        f.unlink()
    procs, merged = [], {}

    # generous per-shard ceiling: the slowest honest shard (DuckDB window
    # replays at sf1) runs minutes, but a worker stuck in a spill loop
    # (disk-full thrash rather than a clean OOM kill) would otherwise
    # hang the whole sweep forever on the timeout-less wait
    shard_timeout_s = int(os.environ.get("SWEEP_SHARD_TIMEOUT_S", "1800"))

    def timeout_for(shard_names):
        # heavy gates get their own sequential time on top of the base
        # ceiling — a shard's honest wall is the SUM of its members
        extra = sum(900 for n in shard_names if est[n] > 12.0)
        return shard_timeout_s + extra

    def settle(p, pj, shard_names, rc):
        if rc != 0 or not pj.exists():
            # a crashed/hung shard (OOM-kill, spill loop) marks its own
            # gate list errored — carried alongside the proc, never
            # re-parsed out of argv
            for n in shard_names:
                merged[n] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"shard worker exited rc={rc}"}
        else:
            merged.update(json.loads(pj.read_text()))
        print(f"[sweep] {len(merged)}/{len(names)} gates merged", flush=True)

    import time

    def reap(block=False):
        # poll-based: admit new work as soon as ANY worker frees budget,
        # not when the FIFO head happens to finish
        while True:
            for rec in list(procs):
                p, pj, shard_names, cost, t0 = rec
                rc = p.poll()
                if rc is None and time.time() - t0 > timeout_for(shard_names):
                    p.kill()
                    p.wait()
                    rc = -9
                if rc is not None:
                    procs.remove(rec)
                    settle(p, pj, shard_names, rc)
            if not block or not procs:
                return
            time.sleep(0.5)

    for i, shard in enumerate(shards):
        # admission control: concurrency cap AND memory budget. A shard
        # whose lone cost exceeds the whole budget is admitted when the
        # host is otherwise EMPTY — waiting can never make it cheaper,
        # and the estimate deliberately overshoots (refusing it forever
        # deadlocked the first run of this scheduler)
        while True:
            reap()
            used = sum(r[3] for r in procs)
            if len(procs) < parallel and used + shard_cost[i] <= budget:
                break
            if not procs and shard_cost[i] > budget:
                print(f"[sweep] shard {i} cost {shard_cost[i]:.0f} GB > "
                      f"budget {budget:.0f} GB — running it alone",
                      flush=True)
                break
            time.sleep(0.5)
        pj = tmpdir / f"shard_{i}.json"
        p = subprocess.Popen(
            [sys.executable, __file__, "--shard-worker",
             sf_dir, out_dir, str(pj)] + shard)
        procs.append((p, pj, shard, shard_cost[i], time.time()))
    reap(block=True)

    # resource-failure retry pass, SEQUENTIAL and small: `parallel`
    # concurrent DuckDB workers each capped at 24 GB can together exceed
    # the host under the sf1 window replays — those gates die with a
    # worker rc=-9 or a DuckDB "Out of Memory Error", which is a CHECKER
    # resource failure, not a correctness verdict (round 15: 29 gates in
    # one sweep). Re-run just those gates one worker at a time, tiny
    # shards, so each retry gets the whole host; a gate that fails again
    # keeps its error and fails the sweep honestly.
    retry = sorted(
        n for n, v in merged.items()
        if v["err"] and ("worker exited" in v["err"]
                         or "Out of Memory" in v["err"]))
    if retry:
        print(f"[sweep] retrying {len(retry)} resource-failed gates "
              f"sequentially", flush=True)
        for i in range(0, len(retry), 2):
            chunk = retry[i:i + 2]
            pj = tmpdir / f"retry_{i}.json"
            p = subprocess.Popen(
                [sys.executable, __file__, "--shard-worker",
                 sf_dir, out_dir, str(pj)] + chunk)
            try:
                rc = p.wait(timeout=timeout_for(chunk))
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
                rc = -9
            if rc == 0 and pj.exists():
                merged.update(json.loads(pj.read_text()))
            print(f"[sweep] retried {min(i + 2, len(retry))}/{len(retry)}",
                  flush=True)

    Path(out_json).write_text(json.dumps(
        {k: merged[k] for k in sorted(merged)}, indent=1))
    npass = sum(1 for v in merged.values()
                if v["rows_match"] and v["schema_match"] and v["hash_match"])
    print(f"[sweep] {npass}/{len(merged)} gates green -> {out_json}")
    sys.exit(0 if npass == len(merged) else 1)


if __name__ == "__main__":
    main()
