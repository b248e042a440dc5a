"""Time every oracle_sql() query in DuckDB over one sf dir (single-
threaded, warm best-of-N) and write JSON {key: sec} — the per-query
baseline side of BASELINE.md's comparison table.

Usage: python scripts/oracle_times.py [sf_dir] [out.json] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fanstats_producer_spark import registry
from fanstats_producer_spark.io import TABLES

registry.load_all()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_times.json"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
        con.execute(f"SELECT count(*) FROM {t}").fetchall()  # warm page cache

    times: dict[str, float] = {}
    for key in sorted(registry.ORACLE):
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(registry.ORACLE[key]).fetchall()
                best = min(best, time.perf_counter() - t0)
            times[key] = round(best, 3)
        except Exception as e:  # noqa: BLE001 — record, keep timing the rest
            times[key] = -1.0
            print(f"ERR {key}: {str(e)[:100]}", file=sys.stderr)

    with open(out, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "total": round(sum(v for v in times.values() if v > 0), 3),
             "queries": times},
            fh, indent=1,
        )
    print(json.dumps({"total": sum(v for v in times.values() if v > 0),
                      "n": len(times)}))


if __name__ == "__main__":
    main()
