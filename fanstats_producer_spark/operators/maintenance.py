"""Table maintenance operators — the housekeeping layer a partitioned
lake needs at scale (the reference's daily-crawl landing zone,
reference main.py:70-73, accumulates one small file per run per topic:
exactly the small-files problem these jobs fix).

- `compact_partitions`: rewrite selected partitions into
  right-sized files with dynamic partition overwrite (readers of other
  partitions are untouched — the only safe overwrite mode for a live
  table).
- `cluster_within_partitions`: range-partition + sort-within-files on
  chosen keys: parquet min/max page stats become selective, so
  post-compaction scans prune at the row-group level (leading-key only).
- `zorder_by`: true multi-dimension clustering — Morton bit-interleave
  of rank-normalized keys, so min/max pruning works for filters on ANY
  of the clustered columns, not just the leading sort key.
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


def zorder_by(
    df: DataFrame,
    cols: list[str],
    n_files: int = 4,
    bits: int = 8,
    relative_error: float = 0.001,
) -> DataFrame:
    """Z-order (Morton-interleave) layout across several columns at once.

    `cluster_within_partitions` gives tight min/max stats on ONE leading
    sort key; a query filtering only the second key still reads every
    file.  Z-ordering interleaves the bits of all cluster keys so file
    ranges are locality-preserving in EVERY keyed dimension — each file
    holds a hypercube of the key space, and min/max pruning works for
    filters on any subset of `cols`.

    Each column is rank-normalized to [0, 2^bits) — distribution-robust;
    raw values would let one skewed column dominate the interleave —
    using approxQuantile bucket edges (one distributed GK-sketch pass per
    column, driver gets 2^bits-1 doubles) and an MLlib Bucketizer
    (broadcast splits, per-row binary search).  No global sort, no
    single-task window, at ANY row count; the only full sort left is the
    final range partitioning over the z-value, which is the write layout
    itself.  2^bits buckets per dimension: 256 at the default, far finer
    than any realistic file count, so pruning quality matches the exact
    percent_rank formulation.  Then bits interleave via shift/or folds
    and rows land in files by range over the z-value.
    """
    from pyspark.ml.feature import Bucketizer

    normed = df
    zcols = []
    for c in cols:
        nc = f"__n_{c}"
        dc = f"__d_{c}"
        normed = normed.withColumn(dc, F.col(c).cast("double"))
        probs = [i / (1 << bits) for i in range(1, 1 << bits)]
        edges = normed.approxQuantile(dc, probs, relative_error)
        splits = [float("-inf")] + sorted(set(edges)) + [float("inf")]
        normed = Bucketizer(
            splits=splits, inputCol=dc, outputCol=nc + "_d", handleInvalid="keep"
        ).transform(normed)
        # handleInvalid="keep" routes nulls to one extra bucket past the
        # last; clamp so the index always fits in `bits` bits.
        normed = normed.withColumn(
            nc,
            F.least(F.col(nc + "_d").cast("long"), F.lit((1 << bits) - 1)),
        ).drop(nc + "_d", dc)
        zcols.append(nc)
    # interleave: bit i of column j lands at position i * n_cols + j
    n = len(zcols)
    terms = [
        F.shiftleft(
            F.shiftright(F.col(c), i).bitwiseAND(F.lit(1)), i * n + j
        )
        for i in range(bits)
        for j, c in enumerate(zcols)
    ]
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return (
        normed.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *zcols)
    )
