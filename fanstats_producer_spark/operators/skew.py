"""Skew and co-location utilities (SURVEY.md §4; the 100 TB levers).

Three tools for the shuffle problems that appear only at scale:

- `salted_join`: explicit key-salting for joins where one side has
  pathological hot keys (a fan page with 100M posts).  The hot side gets
  a random salt in [0, n); the other side explodes each row n ways.
  AQE's skew-join splitting handles *moderate* skew automatically —
  salting is for the long tail AQE can't split (single-key hot spots in
  a sort-merge join with aggregation pushed behind it).
- `salted_groupby_count`: two-phase aggregation for hot grouping keys —
  partial count per (key, salt), then final sum per key.  For algebraic
  aggregates Spark's partial aggregation already does this; the explicit
  form is for when the combine step is custom (collect-like states).
- `runtime_bloom_filters`: opt-in runtime semi-join reduction — a
  bloom filter built from the selective build side is probed on the
  fact side BEFORE its shuffle, cutting exchange bytes at the source.
- `write_bucketed` / co-located join: persist both join sides bucketed
  by the join key → sort-merge join with ZERO Exchange on either side.
  At 100 TB this turns every repeated fact-fact join on the same key
  into a shuffle-free merge (verified by plan assertion in
  tests/test_scale.py).
"""

from __future__ import annotations

import contextlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join on `key` with the left side salted (left = the skewed side).

    left rows get salt = pmod(rand-free deterministic hash of a unique
    expr, n) — we use monotonically_increasing_id so the salt is
    uniform without an RNG (reproducible runs); right rows replicate
    across all salts.

    Only join types where the replicated right side cannot emit
    unmatched rows are sound: with how='right'/'full_outer' every
    unmatched right row would surface n_salts times (once per salt
    replica), so those are rejected.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is unsupported — the right side is "
            f"replicated across {n_salts} salts, so join types that emit "
            f"unmatched right rows would duplicate them. Use one of "
            f"{sorted(allowed)} (put the skewed side on the left)."
        )
    lhs = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = lhs.join(rhs, [key, "__salt"], how)
    return out.drop("__salt")


def salted_groupby_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase hot-key aggregation: (key, salt) partials → key totals."""
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").cast("long").alias("n"))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist bucketed (+sorted) by the join key: repeated joins on
    `key` become exchange-free sort-merge joins."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


@contextlib.contextmanager
def runtime_bloom_filters(
    spark,
    creation_side_threshold: str = "100MB",
    application_side_threshold: str = "10GB",
):
    """Enable Catalyst's runtime bloom-filter semi-join reduction for the
    enclosed plans (and restore prior conf on exit).

    When a shuffle join's build side is selective, the optimizer inserts a
    bloom_filter_agg over the build keys and a might_contain probe on the
    stream side BEFORE its shuffle — at 100 TB this drops the bulk of the
    fact table's rows ahead of the exchange, which is exactly where the
    bytes are.  Thresholds gate injection: the filter is only worth
    building when the build side is small enough to aggregate cheaply and
    the probe side scan is big enough to care (defaults here mirror that
    trade; tests shrink the probe threshold so sf-scale fixtures inject)."""
    pairs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": creation_side_threshold,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": application_side_threshold,
    }
    saved = {}
    for k, v in pairs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
