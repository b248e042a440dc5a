"""Measure the Spark-vs-DuckDB scaling trend for a key list at one sf
dir (warm best-of-2 per engine) — the data source for BASELINE.md's
"Scaling trend" table, including local generator output (scripts/
gen_sf.py) for SFs the driver does not ship.

Usage: python scripts/scale_trend.py <sf_dir> [key ...]
Prints one JSON line: {"sf_dir":..., "keys": {key: {"spark": s, "duckdb": s}}}
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
from fanstats_producer_spark.session import get_spark

registry.load_all()

DEFAULT_KEYS = [
    "q00_flagship_daily_rollup", "q20_agg", "q14_star",
    "x04_neardup_jaccard", "x04e_dedup_clusters", "x04d_minhash_native",
    "x05_knn", "q51_interval_join", "q52_corr", "s04_session",
    "q65_pagerank", "x39_span_dedup", "x47_edit_verify",
    "x52_dedup_keep_best",
]


def main() -> None:
    sf_dir = sys.argv[1]
    keys = sys.argv[2:] or DEFAULT_KEYS

    spark = get_spark("scale-trend")
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
        con.execute(f"SELECT count(*) FROM {t}").fetchall()

    out: dict[str, dict[str, float]] = {}
    for key in keys:
        cell: dict[str, float] = {}
        # warm best-of-2, but skip the second run once a cell is slow
        # enough (>30 s) that scheduling noise is irrelevant
        fn = registry.QUERIES[key]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = time.perf_counter() - t0
        if best <= 30:
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        cell["spark"] = round(best, 3)
        sql = registry.ORACLE.get(key)
        if sql:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = time.perf_counter() - t0
            if best <= 30:
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            cell["duckdb"] = round(best, 3)
        out[key] = cell
        print(f"# {key}: {cell}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "keys": out}))


if __name__ == "__main__":
    main()
