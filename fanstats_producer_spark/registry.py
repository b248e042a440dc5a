"""Query registry: the single source of truth wired into __spark_entry__.py.

Each operator from SURVEY.md §2 registers itself here with a Spark builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB oracle
SQL string over the same parquet tables.  Column names are aliased
identically on both sides — the driver sorts columns by name and value-
hashes, so name or type drift is a correctness failure.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder under ``key`` with an optional DuckDB
    oracle. No oracle ⇒ the driver records a weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from fanstats_producer_spark.operators import (  # noqa: F401
        aggregates,
        asof,
        clustering,
        corpus,
        corpus_extra,
        dedup,
        graph,
        joins,
        layout,
        llm_data,
        nested,
        parity_extra,
        product_analytics,
        quality_checks,
        relational,
        sampling,
        scd,
        scoring,
        setops,
        similarity,
        sketches,
        timeseries,
        tpch,
        windows,
    )
    from fanstats_producer_spark.functions import (  # noqa: F401
        chunking,
        scalars,
        text,
        text_extra,
        udfs,
    )
    from fanstats_producer_spark.operators import subqueries  # noqa: F401
    from fanstats_producer_spark.streaming import batch_equiv  # noqa: F401
    from fanstats_producer_spark.streaming import driver_entries  # noqa: F401
    from fanstats_producer_spark.operators import multimodal  # noqa: F401
