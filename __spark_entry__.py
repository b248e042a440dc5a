"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over fanstats_producer_spark's query registry: every
implemented operator from SURVEY.md §2 registers a (spark, sf_dir) ->
DataFrame builder plus (when SQL-expressible) a DuckDB oracle SQL string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fanstats_producer_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily fan-engagement rollup) on sf0.001."""
    return registry.QUERIES["q00_flagship_daily_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted ⇒ rows-only check)."""
    return dict(registry.ORACLE)
