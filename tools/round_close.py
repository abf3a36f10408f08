#!/usr/bin/env python3
"""One-command round-close gate: every closing discipline, failing loudly.

Usage:
  python3 tools/round_close.py \
      --correctness CORRECTNESS_sf1.json \
      --bench bench_last.json --bench-scaled bench_sf1.json

Round 14 closed with five separately-invoked checks documented in prose
(factor audit, sharded sweep, warm-run classification, leak grep, the
ADVICE ledger assertion); this script is those checks as code. Run it
before committing round-close artifacts; exit 0 means the round is
closeable.

Checks:
  1. correctness artifact: every gate rows+schema+hash green, zero err
  2. factor audit: bench vs bench-scaled under the wall-factor gate
     (tools/factor_audit.py + its committed allowlist)
  3. warm-run classification on BOTH bench artifacts
     (tools/warm_check.py + its committed bands)
  4. leak grep over src/ and tools/: no external URLs off the public
     allowlist, no cloud bucket schemes, no credential-shaped strings,
     no non-SPARK_/COURSIER_ env-var reads
  5. ADVICE.md ledger: every advice bullet carries a FIXED(...) or
     ACCEPTED(...) disposition line
  6. parallelism invariance: the --invariance artifact (written by
     tools/invariance_check.py) must cover the FULL surface (no "only"
     tag), list zero mismatched/missing gates, and its gate count must
     equal the correctness artifact's — the surface-wide determinism
     fact the round-16 verdict promoted from the judge's 5-gate probe
  7. perf ledger: every gate within 1.5x of its best-known idle time
     after dividing out the day's median drift (tools/perf_ledger.py +
     its committed tools/perf_ledger.json) — the drift-normalized
     per-gate floor that keeps real regressions out of the weather
  8. window tie audit: every OVER clause in the round's oracle set is
     adjudicated tie-safe in tools/tie_adjudicated.json
     (tools/tie_audit.py) — the q_ts_interval_merge sf1 lesson: a
     window ORDER BY that admits ties among distinguishable rows is
     engine-sort-lottery, and a new window must be reviewed before it
     can reach the driver
"""
import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO = HERE.parent


def check_correctness(path):
    d = json.loads(Path(path).read_text())
    bad = [k for k, v in d.items()
           if not (v.get("rows_match") and v.get("schema_match")
                   and v.get("hash_match")) or v.get("err")]
    if bad:
        return [f"correctness {path}: {len(bad)} non-green gates: "
                f"{bad[:10]}"]
    print(f"[round-close] correctness: {len(d)} gates green in {path}")
    return []


def run_tool(argv, name):
    r = subprocess.run([sys.executable, *argv], cwd=REPO)
    if r.returncode != 0:
        return [f"{name} failed (rc={r.returncode}) — see output above"]
    return []


# Public hosts that legitimately appear in Scaladoc citations/comments;
# synthetic fixture hosts live in the committed tools/leak_allowlist.json.
PUBLIC_HOSTS = re.compile(
    r"^(localhost(:\d+)?|127\.0\.0\.1(:\d+)?|(www\.)?(apache\.org|"
    r"github\.com|arxiv\.org|aclanthology\.org|spark\.apache\.org|"
    r"duckdb\.org|en\.wikipedia\.org|doi\.org|dl\.acm\.org|"
    r"openreview\.net|scala-lang\.org|docs\.oracle\.com|w3\.org|"
    r"ietf\.org|unicode\.org|sitemaps\.org)(/.*)?$)")
LEAK_PATTERNS = [
    ("url", re.compile(r"https?://([\w.:@-]+)")),
    # a bucket LEAK needs a bucket name; a bare `s3a://, ...` in a doc
    # comment enumerating public Hadoop schemes does not name a system
    ("bucket", re.compile(r"\b(?:s3|gs|s3a|s3n|abfss?|wasbs?)://([\w-]{3,})")),
    ("aws-key", re.compile(r"\bAKIA[0-9A-Z]{16}\b")),
    ("env", re.compile(r"""sys\.env(?:\.get(?:OrElse)?)?\(\s*"([^"]+)""")),
]
ENV_ALLOW = re.compile(r"^(SPARK_|COURSIER_|JAVA_|HOME$|PATH$|TMPDIR$)")


def leak_scan():
    allow = json.loads((HERE / "leak_allowlist.json").read_text())
    host_allow = [re.compile(h) for h in allow["hosts"]]
    problems = []
    files = []
    for base in [REPO / "src", REPO / "tools"]:
        files += [p for p in base.rglob("*")
                  if p.suffix in (".scala", ".py", ".json", ".md", ".sbt")
                  and p.name not in ("round_close.py", "leak_allowlist.json")]
    for p in files:
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for kind, pat in LEAK_PATTERNS:
                for m in pat.finditer(line):
                    g = m.group(1) if m.groups() else m.group(0)
                    if kind == "url" and (
                            PUBLIC_HOSTS.match(g)
                            or any(h.match(g.lower()) for h in host_allow)):
                        continue
                    if kind == "env" and ENV_ALLOW.match(g):
                        continue
                    problems.append(
                        f"leak[{kind}] {p.relative_to(REPO)}:{i}: "
                        f"{line.strip()[:120]}")
    if not problems:
        print(f"[round-close] leak grep: 0 hits over {len(files)} files")
    return problems


def check_invariance(path, correctness_path):
    p = Path(path)
    if not p.exists():
        return [f"invariance artifact {path} missing — run "
                "tools/invariance_check.py over the full surface first"]
    d = json.loads(p.read_text())
    problems = []
    if d.get("only"):
        problems.append(f"invariance {path} is a partial sweep "
                        f"(only={d['only'][:5]}...) — close needs the full "
                        "surface")
    if d.get("mismatched") or d.get("missing"):
        problems.append(
            f"invariance {path}: mismatched={d.get('mismatched')[:10]} "
            f"missing={d.get('missing')[:10]}")
    if d.get("identical") != d.get("total") or not d.get("total"):
        problems.append(f"invariance {path}: identical {d.get('identical')} "
                        f"!= total {d.get('total')}")
    n_gates = len(json.loads(Path(correctness_path).read_text()))
    if d.get("total") != n_gates:
        problems.append(
            f"invariance {path} covers {d.get('total')} gates but the "
            f"correctness artifact has {n_gates} — stale sweep")
    if not problems:
        print(f"[round-close] invariance: {d['identical']}/{d['total']} "
              f"gates dump-identical at cpus {d.get('cpus')}")
    return problems


def check_advice():
    text = (REPO / "ADVICE.md").read_text()
    problems = []
    # bullets start "- **sev** path — claim"; the disposition convention
    # is an indented line inside the bullet carrying FIXED(...)/ACCEPTED(...)
    bullets = re.split(r"^(?=- \*\*)", text, flags=re.M)
    for b in bullets:
        if not b.startswith("- **"):
            continue
        head = b.splitlines()[0][:100]
        if "FIXED(" not in b and "ACCEPTED(" not in b:
            problems.append(f"ADVICE.md item lacks FIXED()/ACCEPTED() "
                            f"disposition: {head}")
    if not problems:
        n = sum(1 for b in bullets if b.startswith("- **"))
        print(f"[round-close] ADVICE.md ledger: {n} items all dispositioned")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--correctness", required=True,
                    help="driver-format correctness JSON to assert green")
    ap.add_argument("--bench", required=True, help="base bench artifact")
    ap.add_argument("--bench-scaled", required=True,
                    help="scaled (10x) bench artifact")
    ap.add_argument("--bench-extra", default=None,
                    help="optional second same-day base artifact; the perf "
                         "ledger audits the per-gate MIN of the pair, which "
                         "kills single-run rotating-tail scatter (a real "
                         "regression raises the min, scatter does not)")
    ap.add_argument("--skip-advice", action="store_true",
                    help="before the close edit that dispositions ADVICE.md")
    ap.add_argument("--invariance", default=str(REPO / "INVARIANCE.json"),
                    help="parallelism-invariance artifact "
                         "(tools/invariance_check.py output)")
    ap.add_argument("--oracle", default="/tmp/verify_sf1/oracle_sql.json",
                    help="oracle_sql.json (or verify dir) for the window "
                         "tie audit; defaults to the round's sf1 dump")
    args = ap.parse_args()

    problems = []
    problems += check_correctness(args.correctness)
    problems += run_tool([str(HERE / "tie_audit.py"), args.oracle],
                         "tie_audit")
    problems += check_invariance(args.invariance, args.correctness)
    problems += run_tool([str(HERE / "factor_audit.py"), args.bench,
                          args.bench_scaled], "factor_audit")
    problems += run_tool([str(HERE / "warm_check.py"), args.bench],
                         "warm_check(base)")
    problems += run_tool([str(HERE / "warm_check.py"), args.bench_scaled],
                         "warm_check(scaled)")
    ledger_args = [str(HERE / "perf_ledger.py"), "audit", args.bench]
    if args.bench_extra:
        ledger_args.append(args.bench_extra)
    problems += run_tool(ledger_args, "perf_ledger")
    problems += leak_scan()
    if not args.skip_advice:
        problems += check_advice()

    for p in problems:
        print(f"[round-close] FAIL: {p}")
    if problems:
        print(f"[round-close] NOT CLOSEABLE: {len(problems)} problems")
        return 1
    print("[round-close] ALL CHECKS GREEN — round is closeable")
    return 0


if __name__ == "__main__":
    sys.exit(main())
