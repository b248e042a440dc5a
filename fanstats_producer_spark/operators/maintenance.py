"""Table maintenance operators — the housekeeping layer a partitioned
lake needs at scale (the reference's daily-crawl landing zone,
reference main.py:70-73, accumulates one small file per run per topic:
exactly the small-files problem these jobs fix).

- `compact_partitions`: rewrite selected partitions into
  right-sized files with dynamic partition overwrite (readers of other
  partitions are untouched — the only safe overwrite mode for a live
  table).
- `cluster_within_partitions`: range-partition + sort-within-files on
  chosen keys (poor-man's Z-order): parquet min/max page stats become
  selective, so post-compaction scans prune at the row-group level.
- `analyze_table`: collect table+column statistics so the cost-based
  optimizer can reorder joins / pick broadcast sides from real NDVs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_files_per_partition: int = 1,
    predicate: str | None = None,
) -> None:
    """Rewrite (a subset of) a partitioned parquet layout with
    `target_files_per_partition` files per partition directory."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df = spark.read.parquet(path)
        if predicate:
            df = df.filter(predicate)
        (
            df.repartition(target_files_per_partition, partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def cluster_within_partitions(
    df: DataFrame, partition_col: str, cluster_cols: list[str], n_files: int = 4
) -> DataFrame:
    """Range-cluster rows across `n_files` output slices and sort within
    each — downstream scans filtering on cluster_cols skip whole row
    groups via parquet min/max stats."""
    return df.repartitionByRange(n_files, *cluster_cols).sortWithinPartitions(
        partition_col, *cluster_cols
    )


def analyze_table(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """ANALYZE for the CBO (the reference's daily crawler refresh,
    main.tf:309, doubles as its stats refresh)."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
