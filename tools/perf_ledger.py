#!/usr/bin/env python3
"""Per-gate best-known-idle perf ledger (round-16 verdict item 2).

The repo's perf story normalized whole-artifact totals against a round-1
self-baseline, adjudicating each round's creep as host-day drift via
same-day controls — credible, but with no per-gate floor a real 1.2x code
regression on a 1.2x-drift day was indistinguishable from weather. This
ledger IS that floor: each gate's minimum known idle sharded time, and an
audit that divides out the day's median drift before flagging.

Usage:
  python3 tools/perf_ledger.py seed  <bench.json> [...more]   # (re)build ledger
  python3 tools/perf_ledger.py audit <bench.json> [--update]  # close gate

seed: per-gate MINIMUM seconds across the given artifacts -> the committed
ledger (tools/perf_ledger.json), recording which artifact supplied each
floor. Re-seeding is an explicit, reviewable act (e.g. after a deliberate
algorithmic trade) — the audit never silently rewrites history.

audit: for a fresh bench artifact,
  day_drift = median over overlapping gates of sec/best   (the weather)
  normalized ratio = sec / (best * day_drift)
flags every gate with normalized ratio > --max-ratio (default 1.5) AND
sec > --min-sec (default 0.5 s; sub-second rows are fixed-overhead noise —
the r14/r15 scatter class). Exit 1 on any flag. With --update, gates whose
RAW sec undercuts their ledger best are lowered (raw, never normalized:
drift estimates must not compound into the floor) and NEW gates are
inserted; the updated ledger is rewritten only when the audit passes.
"""
import json
import statistics
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
LEDGER = HERE / "perf_ledger.json"


def load_queries(path):
    d = json.loads(Path(path).read_text())
    q = d.get("queries", d)
    # gate names only: flat-format probe artifacts carry meta fields
    # (cpus/n/rc/sf) at the same level as the per-gate seconds
    return {k: float(v) for k, v in q.items()
            if k.startswith("q_") and isinstance(v, (int, float))}


def seed(paths, ledger_path=LEDGER):
    best = {}
    for p in paths:
        for gate, sec in load_queries(p).items():
            cur = best.get(gate)
            if cur is None or sec < cur["best_sec"]:
                best[gate] = {"best_sec": round(sec, 4), "src": Path(p).name}
    ledger_path.write_text(
        json.dumps(best, indent=1, sort_keys=True) + "\n")
    print(f"[perf-ledger] seeded {len(best)} gates from {len(paths)} "
          f"artifacts -> {ledger_path}")
    return 0


def audit(bench_path, max_ratio=1.5, min_sec=0.5, update=False,
          ledger_path=LEDGER):
    if not ledger_path.exists():
        print(f"[perf-ledger] no ledger at {ledger_path} — run seed first")
        return 1
    ledger = json.loads(ledger_path.read_text())
    cur = load_queries(bench_path)
    overlap = [g for g in cur if g in ledger and ledger[g]["best_sec"] > 0]
    if len(overlap) < 20:
        print(f"[perf-ledger] only {len(overlap)} overlapping gates — "
              "not enough signal to estimate day drift")
        return 1
    drift = statistics.median(
        cur[g] / ledger[g]["best_sec"] for g in overlap)
    drift = max(drift, 0.5)  # degenerate-overlap guard
    flags = []
    for g in sorted(overlap):
        best = ledger[g]["best_sec"]
        norm = cur[g] / (best * drift)
        if norm > max_ratio and cur[g] > min_sec:
            flags.append((g, cur[g], best, norm))
    new_gates = sorted(set(cur) - set(ledger))
    print(f"[perf-ledger] {bench_path}: day drift x{drift:.3f} "
          f"(median over {len(overlap)} gates), {len(new_gates)} new gates")
    for g, sec, best, norm in flags:
        print(f"[perf-ledger] FLAG {g}: {sec:.2f}s vs best {best:.2f}s "
              f"-> x{norm:.2f} normalized (> x{max_ratio})")
    if update and not flags:
        changed = 0
        for g, sec in cur.items():
            rec = ledger.get(g)
            if rec is None or sec < rec["best_sec"]:
                ledger[g] = {"best_sec": round(sec, 4),
                             "src": Path(bench_path).name}
                changed += 1
        if changed:
            ledger_path.write_text(
                json.dumps(ledger, indent=1, sort_keys=True) + "\n")
            print(f"[perf-ledger] updated {changed} floors -> {ledger_path}")
    if flags:
        print(f"[perf-ledger] {len(flags)} gates above the drift-normalized "
              "floor — a real regression can no longer hide in weather")
        return 1
    print(f"[perf-ledger] all {len(overlap)} gates within x{max_ratio} of "
          "their drift-normalized best")
    return 0


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    mode = sys.argv[1]
    if mode == "seed":
        return seed(sys.argv[2:])
    if mode == "audit":
        args = sys.argv[2:]
        update = "--update" in args
        args = [a for a in args if a != "--update"]
        opts = dict(zip(args[1::2], args[2::2]))
        return audit(args[0],
                     max_ratio=float(opts.get("--max-ratio", 1.5)),
                     min_sec=float(opts.get("--min-sec", 0.5)),
                     update=update)
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
