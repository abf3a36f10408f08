#!/usr/bin/env python3
"""Window tie-order audit (round 16).

The q_ts_interval_merge sf1 divergence came from a window function whose
ORDER BY did not totally order rows that a prior pass had made
distinguishable: DuckDB's parallel re-sort swapped a tied pair and the
island running sum went to the wrong row. The class is generic — ANY
window whose ORDER BY admits ties among rows that differ in an emitted or
aggregated column is engine-sort-lottery, and it only shows up when the
data actually carries the tie (sf1 did; sf0.01 did not).

This audit makes tie-safety a REVIEWED property instead of a hope:

  python3 tools/tie_audit.py <oracle_sql.json>          # audit
  python3 tools/tie_audit.py <oracle_sql.json> --accept # adjudicate new

It extracts every OVER clause (inline and named WINDOW) from every oracle,
normalizes (gate, PARTITION BY keys, ORDER BY keys) triples, and compares
the set against the committed adjudication file tools/tie_adjudicated.json.
A triple not in the file fails the audit with instructions: review the new
window for tie-safety (unique trailing key, RANGE frame, peer-aware rank,
or value-determined selection among equal peers), then re-run with
--accept. Removing a window never fails; the accept pass prunes stale
entries. round_close runs the audit against the round's verify dump, so an
unreviewed window cannot reach the driver.

Adjudication notes for the standing entries live next to the snapshot in
tie_adjudicated.json ("_notes") — the proof sketch per safety class, and
the four q_ts gates that carry explicit event_id tiebreaks since round 16.
"""
import json
import re
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ADJUDICATED = HERE / "tie_adjudicated.json"

_OVER = re.compile(r"OVER\s*(\w+|\((?:[^()]|\([^()]*\))*\))", re.S)
_NAMED = re.compile(
    r"WINDOW\s+(\w+)\s+AS\s+(\((?:[^()]|\([^()]*\))*\))", re.S | re.I)
_PART = re.compile(r"PARTITION\s+BY\s+(.*?)(?:ORDER\s+BY|ROWS|RANGE|GROUPS|$)",
                   re.S | re.I)
_ORD = re.compile(r"ORDER\s+BY\s+(.*?)(?:ROWS|RANGE|GROUPS|$)", re.S | re.I)


def norm(expr):
    return " ".join(expr.replace("\n", " ").strip().rstrip(")").split())


def windows_of(sql):
    named = {m.group(1): m.group(2) for m in _NAMED.finditer(sql)}
    out = set()
    for m in _OVER.finditer(sql):
        body = m.group(1)
        if not body.startswith("("):
            body = named.get(body, "")
        if not body:
            continue
        part = _PART.search(body)
        order = _ORD.search(body)
        out.add((norm(part.group(1)) if part else "",
                 norm(order.group(1)) if order else ""))
    return out


def triples(oracle):
    out = set()
    for name, sql in oracle.items():
        for part, order in windows_of(sql):
            out.add((name, part, order))
    return out


def main():
    args = [a for a in sys.argv[1:] if a != "--accept"]
    accept = "--accept" in sys.argv
    if not args:
        print(__doc__)
        return 2
    p = Path(args[0])
    if p.is_dir():
        p = p / "oracle_sql.json"
    oracle = json.loads(p.read_text())
    cur = triples(oracle)
    known = set()
    notes = {}
    if ADJUDICATED.exists():
        doc = json.loads(ADJUDICATED.read_text())
        notes = doc.get("_notes", {})
        known = {tuple(t) for t in doc.get("windows", [])}
    fresh = sorted(cur - known)
    # stale = adjudicated windows whose GATE is present in this oracle set
    # but whose window spec changed/vanished. Entries for gates absent from
    # the set are kept untouched — a subset verify dump must never prune
    # the full-surface adjudication.
    present = set(oracle)
    stale = sorted(t for t in known - cur if t[0] in present)
    if accept:
        merged = sorted((known - set(stale)) | cur)
        ADJUDICATED.write_text(json.dumps(
            {"_notes": notes, "windows": merged},
            indent=1, sort_keys=True) + "\n")
        print(f"[tie-audit] adjudicated {len(merged)} windows "
              f"(+{len(fresh)} new, -{len(stale)} stale) -> {ADJUDICATED}")
        return 0
    for name, part, order in fresh:
        print(f"[tie-audit] UNREVIEWED window in {name}:\n"
              f"    PARTITION BY {part or '(none)'}\n"
              f"    ORDER BY     {order or '(none)'}")
    if fresh:
        print(f"[tie-audit] {len(fresh)} unadjudicated window(s). Review "
              "each for tie-safety (unique trailing key / RANGE frame / "
              "peer-aware function / value-determined selection), then "
              "re-run with --accept.")
        return 1
    print(f"[tie-audit] all {len(cur)} windows adjudicated "
          f"({len(stale)} stale entries ignored)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
