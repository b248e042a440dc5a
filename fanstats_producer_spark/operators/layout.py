"""Partitioned-layout operators (SURVEY.md §2B q40 + §2A P7/P14).

Materializes the reference's date-partitioned landing layout
(reference main.py:70-73: `<platform>/<topic>/YYYY/MM/DD/...`) as named
Hive partitions and proves the payoff: a filter on the partition key
scans only matching directories (partition pruning) — the 100 TB
equivalent of the reference's "only read today's prefix" access path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


def write_events_partitioned(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """One-time partitioned materialization of events by event_date."""
    ev = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    (
        ev.write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out_dir)
    )


def _layout_dir(sf_dir: str) -> str:
    # Cache key covers the FULL source path and its mtime: two datasets
    # sharing a basename get distinct caches, and regenerated fixture data
    # invalidates the old copy (a fresh key → the _SUCCESS probe misses and
    # the partitioned copy is rewritten).
    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    try:
        mtime = str(int(os.stat(src).st_mtime))
    except OSError:
        mtime = "0"
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{mtime}".encode()
    ).hexdigest()[:16]
    return os.path.join(
        tempfile.gettempdir(), f"fanstats_layout_{key}", "events_by_date"
    )


def ensure_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the write-once partitioned copy if absent and return
    its path.  Exposed separately so bench warmup can pay the one-time
    write outside the timed window (on a fresh host it otherwise lands
    inside q40's measurement — the 6.7x phantom regression in r2)."""
    out = _layout_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        # Stage under a unique name, then rename into place: concurrent
        # bench/test runs can't observe (or clobber) a half-written copy —
        # the loser of the rename race discards its staging dir.
        import shutil
        import uuid

        staging = f"{out}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        write_events_partitioned(spark, sf_dir, staging)
        try:
            os.rename(staging, out)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
    return out


@query(
    "q40_partition_prune",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY 1
    """,
)
def q40_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-once partitioned copy, then a partition-pruned scan: the
    date filter hits partition directories, not row groups (asserted in
    tests/test_plans.py via the scan's `partition count`)."""
    ev = spark.read.parquet(ensure_layout(spark, sf_dir))
    return (
        ev.filter(F.col("event_date").between("2024-01-10", "2024-01-12"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )

# --- x80: Z-order (Morton) multi-dimensional clustering -------------------------
# Hive partitioning (q40 above) prunes on ONE key hierarchy.  When scans
# filter on TWO independent keys (part AND supplier), a 1-D sort layout
# clusters only its leading key — a predicate on the other key overlaps
# every file.  Z-ordering interleaves the bits of both quantized keys so
# file ranges stay tight in BOTH dimensions: with 2^b files a selective
# box predicate touches O(sqrt) of them instead of all (the Delta/
# Databricks OPTIMIZE ZORDER access path, public algorithm: Morton
# codes).  At 100 TB this is a one-shot repartitionByRange on the morton
# column at write time; every later scan prunes via per-file min/max —
# no index structure, just layout.
# The operator reports the layout quality evidence itself: per-file row
# counts and per-dimension min/max spans (what a format's file-statistics
# footer would hold).  Everything is integer arithmetic — quantization is
# (v * 2^bits) DIV (max+1), bit interleave is unrolled add/div/mod — so both
# engines state identical codes.
_X80_BITS = 8  # per-dimension quantization bits
_X80_FILES = 64


def _morton_expr(qx: str, qy: str, intdiv: str) -> str:
    """Unrolled 2-D Morton interleave as pure +,*,div,mod arithmetic.
    `intdiv` is the dialect's integer-division operator ('DIV' for
    Spark, '//' for DuckDB); everything else is shared syntax."""
    terms = []
    for i in range(_X80_BITS):
        terms.append(
            f"((({qx}) {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        )
        terms.append(
            f"((({qy}) {intdiv} {1 << i}) % 2) * {1 << (2 * i)}"
        )
    return " + ".join(terms)


@query(
    "x80_zorder_layout",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(l_partkey) AS mpk, MAX(l_suppkey) AS msk FROM lineitem),
    q AS (
      SELECT l_partkey, l_suppkey,
             (l_partkey * {1 << _X80_BITS}) // (mpk + 1) AS qx,
             (l_suppkey * {1 << _X80_BITS}) // (msk + 1) AS qy
      FROM lineitem CROSS JOIN mx),
    coded AS (
      SELECT l_partkey, l_suppkey,
             ({_morton_expr('qx', 'qy', '//')})
               // {(1 << (2 * _X80_BITS)) // _X80_FILES} AS file_id
      FROM q)
    SELECT file_id, COUNT(*) AS cnt,
           MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
           MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
    FROM coded GROUP BY 1
    """,
)
def x80_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_partkey").alias("mpk"), F.max("l_suppkey").alias("msk")
    )
    q = li.select("l_partkey", "l_suppkey").crossJoin(F.broadcast(mx))
    coded = q.selectExpr(
        "l_partkey",
        "l_suppkey",
        f"(l_partkey * {1 << _X80_BITS}) DIV (mpk + 1) AS qx",
        f"(l_suppkey * {1 << _X80_BITS}) DIV (msk + 1) AS qy",
    ).selectExpr(
        "l_partkey",
        "l_suppkey",
        f"({_morton_expr('qx', 'qy', 'DIV')})"
        f" DIV {(1 << (2 * _X80_BITS)) // _X80_FILES} AS file_id",
    )
    return coded.groupBy("file_id").agg(
        F.count("*").alias("cnt"),
        F.min("l_partkey").alias("pk_min"),
        F.max("l_partkey").alias("pk_max"),
        F.min("l_suppkey").alias("sk_min"),
        F.max("l_suppkey").alias("sk_max"),
    )
