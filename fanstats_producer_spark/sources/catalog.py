"""Catalog tables (SURVEY.md §2A P14: Glue crawler + Data Catalog parity).

The reference's crawler walks the landing prefix daily, infers schemas,
and registers partitioned tables in the Glue database `fanstatsai`
(reference main.tf:301-314).  Spark-native equivalent: saveAsTable into
the session catalog with named partitions, plus partition-discovery
repair (the MSCK REPAIR TABLE analogue) for files that arrived outside
Spark's writers — exactly what a daily crawler run does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_partitioned_table(
    df: DataFrame,
    table: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Land + catalog in one step (crawler-after-write collapsed)."""
    (
        df.write.mode(mode)
        .format(fmt)
        .partitionBy(*partition_cols)
        .saveAsTable(table)
    )


def crawl_landing_dir(
    spark: SparkSession, path: str, table: str, fmt: str = "json"
) -> None:
    """The crawler path proper: infer schema from landed files, register
    an external partitioned table, discover partitions (main.tf:304-314).
    Re-running after new files land refreshes the partition list — the
    daily-crawl refresh."""
    inferred = spark.read.format(fmt).load(path)
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in inferred.schema.fields
        if f.name not in _partition_cols_of(path)
    )
    parts = _partition_cols_of(path)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    part_clause = (
        "PARTITIONED BY (" + ", ".join(f"`{c}` string" for c in parts) + ")"
        if parts
        else ""
    )
    spark.sql(
        f"CREATE TABLE {table} ({ddl}) USING {fmt} {part_clause} LOCATION '{path}'"
    )
    if parts:
        spark.sql(f"MSCK REPAIR TABLE {table}")


def _partition_cols_of(path: str) -> list[str]:
    """Partition columns from the Hive-style directory names under path."""
    import os

    cols: list[str] = []
    cur = path
    while True:
        subdirs = [
            d for d in (os.listdir(cur) if os.path.isdir(cur) else [])
            if "=" in d and os.path.isdir(os.path.join(cur, d))
        ]
        if not subdirs:
            return cols
        name = subdirs[0].split("=", 1)[0]
        cols.append(name)
        cur = os.path.join(cur, subdirs[0])
