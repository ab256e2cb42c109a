#!/usr/bin/env python3
"""Round-over-round per-query regression check that works at ANY boot.

Usage: tools/check_regression.py CURRENT.json PREVIOUS.json [pct] [floor_s]

The BASELINE.md budget gate needs quiet-boot budgets to stay honest,
and quiet windows can be absent for a whole round (r12, r13). This
check is the calib-scaled complement: it compares each query's RAW
time against the previous record's raw time scaled by the calib ratio
of the two boots, flagging rows more than `pct` (default 15%) plus
`floor_s` (default 0.1 s) slower. Contention affects both the calib
workload and the queries, so the ratio cancels the boot — the same
normalization the judge applies across rounds.

Exit 1 if any row regresses; prints the offending rows. Both inputs
are graft.Bench JSON lines (BENCH_LOCAL.json or a committed
BENCH_r{N}.json tail with full "queries"/"calib" fields).

Adjudicating a flag: calib measures AVERAGE boot contention, but
bursts hit individual sub-second rows (r13: w9 flagged at 2.04x in a
full run, then measured 0.82x of its r12 record in a solo re-bench
minutes later). A flagged row is adjudicated by a solo re-run —
`SPARK_GRAFT_BENCH_ONLY=<row> SPARK_GRAFT_BENCH_REPS=5` — before it
counts as a regression; an intentional-rework row (e.g. r13's w7
exact-ntile rewrite) is instead judged against its BASELINE.md budget
threshold and documented in the changelog.
"""
import json
import sys


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    cur = json.load(open(sys.argv[1]))
    prev = json.load(open(sys.argv[2]))
    pct = float(sys.argv[3]) / 100 if len(sys.argv) > 4 else 0.15
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1
    if cur.get("failed") or prev.get("failed"):
        sys.exit(f"REFUSED: failed queries present "
                 f"(cur={cur.get('failed')}, prev={prev.get('failed')})")
    ratio = cur["calib"] / prev["calib"]
    qp = prev["queries"]
    bad = []
    for q, t in sorted(cur["queries"].items()):
        if q not in qp:
            continue  # new query: no prior record to regress against
        allowed = qp[q] * ratio * (1 + pct) + floor
        if t > allowed:
            bad.append((q, qp[q], t, t / (qp[q] * ratio)))
    gone = sorted(set(qp) - set(cur["queries"]))
    print(f"calib cur={cur['calib']} prev={prev['calib']} ratio={ratio:.3f}; "
          f"{len(cur['queries'])} rows checked, {len(bad)} regressed"
          + (f"; {len(gone)} rows missing vs prev: {gone[:5]}" if gone else ""))
    for q, p, c, r in sorted(bad, key=lambda x: -x[3]):
        print(f"  REGRESSED {q}: {p:.3f}s -> {c:.3f}s raw "
              f"({r:.2f}x calib-scaled)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
