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

# --- staged restatements for PLAIN keys whose registered oracle has a
# shape that cannot finish at the probe SF (same protocol as the
# closure keys: pinned staged==registered at sf0.01 before use).
#
# s26b: the registered oracle ranks the full |stream|x|evals| scored
# relation with row_number() OVER (PARTITION BY vec_id ORDER BY
# sim_e6 DESC, eval_id) — a window that must MATERIALIZE the quadratic
# relation (measured at sf10: 1e10 rows, >50 min spilling, unfinished).
# The per-vector argmax is equivalently MIN over the composite integer
# (1e6 − sim_e6)·1e10 + eval_id — the Spark arm's own decode — which
# hash-aggregates in |vectors| state and streams the cross join
# without materializing it.  Equivalence: sim DESC, eval_id ASC
# lexicographic order == composite ascending order because
# (1e6 − sim_e6) ∈ [0, 2e6] and eval_id < 1e10 never carries.


def _s26b_staged_sql() -> str:
    from fanstats_producer_spark.operators.similarity import _X66_THRESH_E6

    return f"""
    WITH e AS (SELECT vec_id AS eval_id, embedding::DOUBLE[] AS ev
               FROM embeddings WHERE vec_id % 2 = 0),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id % 2 = 1),
         agg AS (
           SELECT c.vec_id,
                  MIN((1000000 - CAST(floor(
                        list_cosine_similarity(c.v, e.ev) * 1e6 + 0.5)
                      AS BIGINT)) * 10000000000 + e.eval_id) AS comp
           FROM c CROSS JOIN e GROUP BY c.vec_id)
    SELECT vec_id,
           comp % 10000000000 AS nearest_eval_id,
           1000000 - comp // 10000000000 AS max_sim_e6,
           CAST((1000000 - comp // 10000000000) >= {_X66_THRESH_E6}
                AS INT) AS contaminated
    FROM agg
    """


STAGED_PLAIN = {"s26b_stream_decontam_large_eval": _s26b_staged_sql}


def validate_staged_plain(keys: list[str]) -> bool:
    """Pin each staged-plain restatement against the REGISTERED oracle
    at sf0.01 (where the registered shape still runs)."""
    import sf1_closure_check as s1

    ok = True
    con = _connect(s1.SF001)
    try:
        for key in keys:
            if key not in STAGED_PLAIN:
                continue
            res = con.execute(STAGED_PLAIN[key]())
            sc, sr = canon_rows(
                [d[0] for d in res.description], res.fetchall()
            )
            res = con.execute(registry.ORACLE[key])
            rc, rr = canon_rows(
                [d[0] for d in res.description], res.fetchall()
            )
            good = sc == rc and sr == rr
            ok &= good
            print(
                f"{'PIN-OK' if good else 'PIN-FAIL'} {key}: staged-plain "
                f"{'==' if good else '!='} registered at sf0.01"
            )
    finally:
        con.close()
    return ok


def run_key(spark, sf_dir: str, key: str, staged: bool) -> dict:
    """Spark arm, then oracle arm, each timed and error-isolated: an
    oracle that cannot finish at this SF (the x59-at-sf10 finding —
    DuckDB OOM in the STAGED closure, one staging level past the
    recursive-CTE OOM at sf1) must still leave the Spark side's
    completion time and row count in the record, because 'Spark
    finishes, the single-node oracle does not' IS the scale result."""
    t0 = time.time()
    try:
        sdf = registry.QUERIES[key](spark, sf_dir)
        scols, srows = canon_rows(
            sdf.columns, [tuple(r) for r in sdf.collect()]
        )
    except Exception as e:
        return {
            "match": False,
            "spark_error": f"{type(e).__name__}: {str(e)[:300]}",
            "spark_sec": round(time.time() - t0, 1),
        }
    t_spark = time.time() - t0
    t0 = time.time()
    okey = (
        "staged_oracle_sec"
        if staged
        else ("staged_plain_oracle_sec" if key in STAGED_PLAIN else "oracle_sec")
    )
    con = _connect(sf_dir)
    try:
        if staged:
            ocols, orows = canon_rows(*staged_oracle(con, key))
        else:
            sql = (
                STAGED_PLAIN[key]()
                if key in STAGED_PLAIN
                else registry.ORACLE[key]
            )
            res = con.execute(sql)
            ocols, orows = canon_rows(
                [d[0] for d in res.description], res.fetchall()
            )
    except Exception as e:
        return {
            "match": False,
            "rows": len(srows),
            "spark_sec": round(t_spark, 1),
            "oracle_error": f"{type(e).__name__}: {str(e)[:300]}",
            okey: round(time.time() - t0, 1),
        }
    finally:
        con.close()
    t_oracle = time.time() - t0
    return {
        "match": scols == ocols and srows == orows,
        "rows": len(srows),
        "spark_sec": round(t_spark, 1),
        okey: round(t_oracle, 1),
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
    # staged-plain pins are cheap and not covered by --no-validate's
    # "already pinned" assumption — always run them
    if not validate_staged_plain(plain):
        print("staged-plain pin FAILED — not running the scale sweep")
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
