"""Regenerate BASELINE.md's per-query comparison table from a bench run
and an oracle-timing run.

Usage:
  python scripts/oracle_times.py /root/testdata/sf0.1 /tmp/oracle_times.json
  python scripts/baseline_table.py BENCH_FULL_LATEST.json /tmp/oracle_times.json

Prints the markdown table body (spark sec, duckdb sec, ratio) for every
registered query, with rows-only keys marked.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL_LATEST.json"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_times.json"
    with open(bench_path) as f:
        bench = json.load(f)["queries"]
    with open(oracle_path) as f:
        oracle = json.load(f)["queries"]

    print("| query key | spark sec | duckdb oracle sec | ratio |")
    print("|---|---|---|---|")
    s_tot = d_tot = 0.0
    for key in sorted(bench):
        s = bench[key]
        s_tot += s
        d = oracle.get(key)
        if d is None:
            print(f"| {key} | {s:.2f} | — (rows-only) | — |")
        elif d < 0:
            print(f"| {key} | {s:.2f} | ERR | — |")
        elif d == 0:
            print(f"| {key} | {s:.2f} | <0.001 | — |")
        else:
            d_tot += d
            print(f"| {key} | {s:.2f} | {d:.3f} | {s / d:.1f}x |")
    print()
    print(
        f"totals: spark {s_tot:.1f} s over {len(bench)} queries; "
        f"duckdb {d_tot:.1f} s over {len(oracle)} oracle queries"
    )


if __name__ == "__main__":
    main()
