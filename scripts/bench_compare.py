"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--pct 30] [--abs 0.3]

A query is flagged only when it slowed by BOTH more than --pct percent and
more than --abs seconds — the double threshold keeps the sub-second
scheduling-floor noise (±30% run-to-run on local[32]) from drowning real
regressions.  Exit code 1 if any regression is flagged, so the check can
gate CI.  New/removed keys are reported informationally.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--pct", type=float, default=30.0)
    ap.add_argument("--abs", dest="abs_s", type=float, default=0.3)
    args = ap.parse_args()

    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)

    # The driver line's per-query values switched to integer units in
    # round 7 (self-described by "queries_unit": centisec/decisec;
    # BENCH_FULL/BENCH_LOCAL records carry float seconds and no unit
    # field).  Normalize BOTH sides to seconds so deltas and the --abs
    # threshold always mean seconds regardless of which era/format each
    # file comes from.
    _SCALE = {"centisec": 100.0, "decisec": 10.0, None: 1.0, "sec": 1.0}

    def _in_seconds(rec: dict) -> dict:
        unit = rec.get("queries_unit")
        scale = _SCALE.get(unit)
        if scale is None:
            raise SystemExit(
                f"bench_compare: unknown queries_unit {unit!r} — add it"
                f" to _SCALE (known: {sorted(k for k in _SCALE if k)})"
            )
        return {k: v / scale for k, v in rec.get("queries", {}).items()}

    oq, nq = _in_seconds(old), _in_seconds(new)

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    both = sorted(set(oq) & set(nq))

    regressions, improvements = [], []
    for k in both:
        delta = nq[k] - oq[k]
        pct = 100.0 * delta / oq[k] if oq[k] else float("inf")
        if delta > args.abs_s and pct > args.pct:
            regressions.append((k, oq[k], nq[k], pct))
        elif -delta > args.abs_s and -pct > args.pct:
            improvements.append((k, oq[k], nq[k], pct))

    print(
        f"total: {old.get('value')} -> {new.get('value')} s "
        f"({len(both)} shared, +{len(added)} new, -{len(removed)} removed)"
    )
    for label, rows in (("REGRESSED", regressions), ("improved", improvements)):
        for k, a, b, pct in rows:
            print(f"  {label:9s} {k:32s} {a:7.2f} -> {b:7.2f}  ({pct:+.0f}%)")
    if added:
        print("  new keys:", ", ".join(added))
    if removed:
        print("  removed keys:", ", ".join(removed))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
