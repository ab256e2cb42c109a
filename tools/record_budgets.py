#!/usr/bin/env python3
"""Rewrite the BASELINE.md §3 budget table from a graft.Bench JSON line.

Usage: tools/record_budgets.py BENCH_LOCAL.json <era-tag>

The recorder REFUSES a contended boot (r8/r9 verdicts: the 0.9256-calib
budget table made every cross-boot comparison a hand adjudication):
the run must not carry graft.Bench's "contended" flag (Bench owns the
quiet-calib threshold — host-specific, override via
SPARK_GRAFT_QUIET_CALIB when benching elsewhere). It also refuses runs
with failed queries and runs that don't cover every existing row, so a
subset re-bench can't silently shrink the budget table.
"""
import json
import re
import sys

BASELINE = "BASELINE.md"
CONFIG = "local[32], 16g, AQE, shuffle=32"


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    bench_path, era = sys.argv[1], sys.argv[2]
    with open(bench_path) as f:
        bench = json.loads(f.read().strip())
    calib = bench["calib"]
    # the threshold lives in graft.Bench (single source of truth)
    if "max_calib" not in bench:
        sys.exit(
            "REFUSED: bench line predates the max_calib/contended schema "
            "(round 11) - re-run graft.Bench so the contended flag is "
            "trustworthy.")
    if bench.get("contended"):
        sys.exit(
            f"REFUSED: boot calib {calib} exceeds the quiet threshold "
            f"{bench['max_calib']} per graft.Bench; budgets recorded on a "
            "contended boot poison every later comparison. Re-run "
            "graft.Bench on a quiet machine.")
    if bench.get("failed"):
        sys.exit(f"REFUSED: failed queries present: {bench['failed']}")
    queries = dict(bench["queries"])
    # Consume the record's self-adjudication (r14): a quiet BOOT does
    # not preclude a mid-run burst hitting one row (ix3 printed 7.07 s
    # in a calib-0.55 run whose solo re-bench measured 3.03 s), and a
    # burst number recorded as a budget stays loose for every later
    # round. For each flagged row take min(in-run, solo normalized from
    # the solo window's calib to this boot's) — min, because a CONTENDED
    # solo window would otherwise re-inflate what the in-run number got
    # right.
    adj = bench.get("adjudication") or {}
    solo, solo_calib = adj.get("solo") or {}, adj.get("solo_calib")
    if solo and solo_calib:
        scale = calib / solo_calib
        taken = {q: round(s * scale, 4) for q, s in solo.items()
                 if q in queries and s * scale < queries[q]}
        queries.update(taken)
        print(f"adjudication consumed: {len(taken)}/{len(solo)} rows took "
              f"their solo value (x{scale:.4f} calib-normalized)")
    with open(BASELINE) as f:
        text = f.read()
    row_re = re.compile(
        r"^\| (?P<q>[a-z0-9_]+) \| 0\.1 \| [0-9.]+ \| [0-9.]+ \| [^|]+ \| [^|]+ \|$",
        re.M)
    existing = {m.group("q") for m in row_re.finditer(text)}
    missing = existing - set(queries)
    if missing:
        sys.exit(f"REFUSED: bench run lacks {len(missing)} existing budget "
                 f"rows (subset run?): {sorted(missing)[:5]}...")

    def rewrite(m):
        q = m.group("q")
        return (f"| {q} | 0.1 | {queries[q]:.3f} | {calib:.4f} | "
                f"{CONFIG} | {era} |")

    text = row_re.sub(rewrite, text)
    # append table rows for queries that are new since the last record
    new_qs = sorted(set(queries) - existing)
    if new_qs:
        lines = [f"| {q} | 0.1 | {queries[q]:.3f} | {calib:.4f} | "
                 f"{CONFIG} | {era} |" for q in new_qs]
        # insert after the last table row
        last_row_end = max(m.end() for m in row_re.finditer(text))
        text = text[:last_row_end] + "\n" + "\n".join(lines) + text[last_row_end:]
    with open(BASELINE, "w") as f:
        f.write(text)
    total = sum(queries.values())
    print(f"recorded {len(queries)} rows at calib {calib} "
          f"({len(new_qs)} new), sum {total:.2f}s, era {era}")


if __name__ == "__main__":
    main()
