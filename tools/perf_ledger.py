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
  python3 tools/perf_ledger.py audit <bench.json> [...more] [--update]

seed: per-gate MINIMUM seconds across the given artifacts -> the committed
ledger (tools/perf_ledger.json), recording which artifact supplied each
floor. Re-seeding is an explicit, reviewable act (e.g. after a deliberate
algorithmic trade) — the audit never silently rewrites history.

audit: over one or more same-day bench artifacts; per-gate sec is the MIN
across them (round-16 calibration: single-run per-gate times carry the
rotating right tail — q_doc_simhash_recall read 2.87 s and 5.56 s in two
back-to-back idle runs — and a real code regression raises the MIN while
scatter does not, so pass both runs when a single-run audit flags).
  day_drift = median over overlapping gates of sec/best   (the weather)
  normalized ratio = sec / (best * day_drift)
flags every gate with normalized ratio > --max-ratio (default 1.5) AND
sec > --min-sec (default 0.5 s; sub-second rows are fixed-overhead noise —
the r14/r15 scatter class) AND sec - best*drift > --min-delta (default
1.0 s; a 1.5x on a 0.6 s gate is shard-neighborhood noise, not a finding
— the absolute-materiality guard that keeps the floor actionable).
Exit 1 on any flag. With --update, gates whose RAW sec undercuts their
ledger best are lowered (raw, never normalized: drift estimates must not
compound into the floor) and NEW gates are inserted; the updated ledger
is rewritten only when the audit passes.
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


def audit(bench_paths, max_ratio=1.5, min_sec=0.5, min_delta=1.0,
          update=False, ledger_path=LEDGER):
    if not ledger_path.exists():
        print(f"[perf-ledger] no ledger at {ledger_path} — run seed first")
        return 1
    ledger = json.loads(ledger_path.read_text())
    if isinstance(bench_paths, (str, Path)):
        bench_paths = [bench_paths]
    cur = {}
    for bp in bench_paths:
        for g, sec in load_queries(bp).items():
            cur[g] = min(sec, cur.get(g, sec))
    bench_path = bench_paths[0]
    overlap = [g for g in cur if g in ledger and ledger[g]["best_sec"] > 0]
    if len(overlap) < 20:
        print(f"[perf-ledger] only {len(overlap)} overlapping gates — "
              "not enough signal to estimate day drift")
        return 1
    drift = statistics.median(
        cur[g] / ledger[g]["best_sec"] for g in overlap)
    drift = max(drift, 0.5)  # degenerate-overlap guard
    allow = {}
    allow_path = HERE / "perf_allowlist.json"
    if allow_path.exists():
        allow = json.loads(allow_path.read_text())
    flags = []
    for g in sorted(overlap):
        best = ledger[g]["best_sec"]
        norm = cur[g] / (best * drift)
        gate_max = float(allow.get(g, {}).get("max_ratio", max_ratio))
        if (norm > gate_max and cur[g] > min_sec
                and cur[g] - best * drift > min_delta):
            flags.append((g, cur[g], best, norm))
    new_gates = sorted(set(cur) - set(ledger))
    print(f"[perf-ledger] {', '.join(str(b) for b in bench_paths)}: "
          f"day drift x{drift:.3f} "
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
        paths = []
        while args and not args[0].startswith("--"):
            paths.append(args.pop(0))
        opts = dict(zip(args[0::2], args[1::2]))
        return audit(paths,
                     max_ratio=float(opts.get("--max-ratio", 1.5)),
                     min_sec=float(opts.get("--min-sec", 0.5)),
                     min_delta=float(opts.get("--min-delta", 1.0)),
                     update=update)
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
