"""Multi-source dispatch (SURVEY.md §2A P9).

The reference iterates configured platforms and dispatches a per-platform
collector, erroring on unsupported platforms (reference main.py:203-219;
the architecture diagram also shows planned Facebook/Reddit sources).
Spark-first: each platform collector returns a DataFrame; the fan-out
merge is unionByName(allowMissingColumns=True) with a `platform` lit
column — schema drift between sources is tolerated by name alignment.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Collector = Callable[[SparkSession], DataFrame]


class PlatformRegistry:
    def __init__(self) -> None:
        self._collectors: dict[str, Collector] = {}

    def register(self, platform: str, collector: Collector) -> None:
        self._collectors[platform] = collector

    def collect_all(self, spark: SparkSession, platforms: list[str]) -> DataFrame:
        """P9: per-platform collect + tagged union.  Raises a real
        ValueError on unsupported platforms (the reference string-raises,
        main.py:219 — a quirk we do not replicate)."""
        out: DataFrame | None = None
        for platform in platforms:
            collector = self._collectors.get(platform)
            if collector is None:
                raise ValueError(
                    f"platform not supported: {platform!r} "
                    f"(registered: {sorted(self._collectors)})"
                )
            df = collector(spark).withColumn("platform", F.lit(platform))
            out = df if out is None else out.unionByName(df, allowMissingColumns=True)
        if out is None:
            raise ValueError("no platforms configured")
        return out
