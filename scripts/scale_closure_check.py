"""Scale-proof harness for the heavy dedup/ANN family at ANY locally
generated SF (VERDICT r11 item 1 — sf10): the sf1 closure harness
generalized to a target fixture dir, with incremental per-key output
so a long run commits partial evidence.

Two key classes:
- closure keys (x04e/x59/x60/x61/x96): DuckDB's recursive-CTE oracles
  OOM past sf0.1, so the oracle side runs sf1_closure_check's STAGED
  restatement (temp-table edges + iterative min-label propagation —
  the same algorithm the Spark side runs), whose equivalence to the
  registered oracle is pinned at sf0.01 first.
- plain keys (x68/x74/s26b by default): the REGISTERED oracle runs
  directly against the target SF.

Usage:
    python scripts/scale_closure_check.py --sf-dir localdata/sf10 \
        --out SF10_CLOSURE.json
    # subset / reorder:
    python scripts/scale_closure_check.py --sf-dir localdata/sf10 \
        --keys x59_verified_dedup,x61_semdedup --plain ''

Keys run cheapest-first (measured at sf1) so partial results carry the
most coverage per minute; every key's result is flushed to --out as it
lands.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from sf1_closure_check import (  # noqa: E402
    _connect,
    canon_rows,
    staged_oracle,
    validate_staged,
)

from fanstats_producer_spark import registry  # noqa: E402

registry.load_all()

# cheapest-first by measured sf1 cost (spark + staged oracle seconds:
# x59 151, x61 124, x60 407, x96 430, x04e 665)
CLOSURE_KEYS = [
    "x59_verified_dedup",
    "x61_semdedup",
    "x60_verify_gate_effect",
    "x96_image_cluster_dedup",
    "x04e_dedup_clusters",
]
PLAIN_KEYS = [
    "x68_substring_dup",
    "x74_containment_dup",
    "s26b_stream_decontam_large_eval",
]


def run_key(spark, sf_dir: str, key: str, staged: bool) -> dict:
    t0 = time.time()
    sdf = registry.QUERIES[key](spark, sf_dir)
    scols, srows = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    t_spark = time.time() - t0
    t0 = time.time()
    con = _connect(sf_dir)
    try:
        if staged:
            ocols, orows = canon_rows(*staged_oracle(con, key))
        else:
            res = con.execute(registry.ORACLE[key])
            ocols, orows = canon_rows(
                [d[0] for d in res.description], res.fetchall()
            )
    finally:
        con.close()
    t_oracle = time.time() - t0
    return {
        "match": scols == ocols and srows == orows,
        "rows": len(srows),
        "spark_sec": round(t_spark, 1),
        ("staged_oracle_sec" if staged else "oracle_sec"): round(t_oracle, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/localdata/sf10")
    ap.add_argument("--out", default="/root/repo/SF10_CLOSURE.json")
    ap.add_argument("--keys", default=",".join(CLOSURE_KEYS))
    ap.add_argument("--plain", default=",".join(PLAIN_KEYS))
    ap.add_argument(
        "--no-validate",
        action="store_true",
        help="skip the sf0.01 staged==registered pin (already pinned)",
    )
    args = ap.parse_args()

    closure = [k for k in args.keys.split(",") if k]
    plain = [k for k in args.plain.split(",") if k]

    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    if closure and not args.no_validate:
        if not validate_staged(closure):
            print("staged-oracle pin FAILED — not running the scale sweep")
            return 1

    from fanstats_producer_spark.session import get_spark

    spark = get_spark("scale-closure-check")
    results: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    def flush() -> None:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    for key, staged in [(k, False) for k in plain] + [
        (k, True) for k in closure
    ]:
        if key in results and results[key].get("match"):
            print(f"SKIP {key}: already green in {args.out}")
            continue
        try:
            results[key] = run_key(spark, args.sf_dir, key, staged)
        except Exception as e:  # keep sweeping; record the failure
            results[key] = {"match": False, "error": f"{type(e).__name__}: {e}"}
        flush()
        r = results[key]
        print(
            f"{'OK' if r['match'] else 'FAIL'} {key}: "
            + json.dumps(r, default=str)
        )
    flush()
    return 0 if all(r.get("match") for r in results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
