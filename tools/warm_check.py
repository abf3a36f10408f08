#!/usr/bin/env python3
"""Warm-run classifier for bench artifacts (the round-14 adjudication,
encoded).

Usage:
  python3 tools/warm_check.py <bench.json> [--bands tools/warmup_bands.json]
  python3 tools/warm_check.py --print-bands <bench.json>   # suggest bands

Round 14 established (SCALE.md) that a degraded bench run is classifiable
FROM THE ARTIFACT ALONE: its warmup seconds run far above their recorded
band while `host.other_busy_pct` reads ~0 — i.e. the slowness is
JVM/host state, not other-process contention and not the gates. This
check refuses to bless such an artifact and directs a rerun, replacing
the by-hand classification done in rounds 12-14.

Rules (exit 1 on any):
  1. any warmup family's seconds > its band while other_busy_pct < 5
     -> degraded run, rerun before reading per-gate numbers
  2. any warmup family FAILED (ok=false)
     -> that family's gates carry first-compile JIT on-clock
  3. `failed` non-empty -> not a blessable artifact at all
Contended runs (other_busy_pct >= 5) are reported but NOT failed here:
the per-gate numbers are known-uniformly-dragged and the adjudication is
the judge's documented warm-host median comparison, not a rerun demand.

The band file maps scale key -> family -> max seconds. The scale key is
matched from the artifact's `sf` path: a path containing "sf0.1" uses
"sf0.1"; anything else (the /tmp 10x replica) uses "sf1".
"""
import argparse
import json
import sys
from pathlib import Path


def scale_key(sf_path):
    return "sf0.1" if "sf0.1" in str(sf_path) else "sf1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--bands",
                    default=str(Path(__file__).parent / "warmup_bands.json"))
    ap.add_argument("--print-bands", action="store_true",
                    help="print suggested bands (2x observed) and exit")
    args = ap.parse_args()

    art = json.loads(Path(args.artifact).read_text())
    warmups = art.get("warmups", {})
    host = art.get("host", {})
    other_busy = host.get("other_busy_pct", -1.0)

    if args.print_bands:
        key = scale_key(art.get("sf", ""))
        sugg = {k: int(v["sec"] * 2 + 1) for k, v in warmups.items()}
        print(json.dumps({key: sugg}, indent=2))
        return 0

    bands_all = json.loads(Path(args.bands).read_text())
    key = scale_key(art.get("sf", ""))
    bands = bands_all.get(key, {})

    problems = []
    notes = []
    for fam, rec in warmups.items():
        sec, ok = rec.get("sec"), rec.get("ok", False)
        if not ok:
            problems.append(f"warmup '{fam}' FAILED -> its gate family "
                            f"carries first-compile JIT on-clock")
            continue
        band = bands.get(fam)
        if band is None:
            notes.append(f"warmup '{fam}' has no recorded band at {key} "
                         f"(measured {sec:.1f}s) -> add to warmup_bands.json")
            continue
        if sec > band:
            if 0 <= other_busy < 5:
                problems.append(
                    f"warmup '{fam}' {sec:.1f}s > band {band}s with "
                    f"other_busy {other_busy:.1f}% ~ 0 -> degraded "
                    f"JVM/host state; RERUN this bench before reading "
                    f"per-gate numbers")
            else:
                notes.append(
                    f"warmup '{fam}' {sec:.1f}s > band {band}s but "
                    f"other_busy {other_busy:.1f}% -> contended host; "
                    f"adjudicate by uniform-median drag, not rerun")
    if art.get("failed"):
        problems.append(f"failed gates present: {art['failed']}")
    if other_busy < 0:
        notes.append("artifact carries no host.other_busy_pct "
                     "(pre-round-14 format) -> warm classification is "
                     "advisory only")

    for n in notes:
        print(f"[warm-check] note: {n}")
    for p in problems:
        print(f"[warm-check] FAIL: {p}")
    if problems:
        return 1
    print(f"[warm-check] OK: {len(warmups)} warmups inside {key} bands, "
          f"other_busy {other_busy:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
