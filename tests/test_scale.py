"""Scale-lever tests (SURVEY.md §4): salting correctness, bucketed
exchange-free joins, AQE behavior — the properties that matter at
100 TB, asserted at test scale from real plans and results.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR

from fanstats_producer_spark.io import load
from fanstats_producer_spark.operators.skew import (
    salted_groupby_count,
    salted_join,
    write_bucketed,
)
from fanstats_producer_spark.plans import checks


@pytest.fixture(scope="module")
def skewed(spark):
    """99% of rows share one key — the hot-key shape."""
    hot = spark.range(2000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    tail = spark.range(20).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(tail)


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.range(30).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = skewed.join(dim, "k").groupBy("k").agg(F.count("*").alias("n"))
    salted = salted_join(skewed, dim, "k").groupBy("k").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_groupby_matches_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(F.count("*").cast("long").alias("n"))
    salted = salted_groupby_count(skewed, "k")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed by the key → sort-merge join with zero
    shuffles (the plan must contain no Exchange)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load(spark, SF_DIR, "orders")
        lineitem = load(spark, SF_DIR, "lineitem")
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", "o_orderkey", n_buckets=8,
        )
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = checks.explain_str(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # and it still computes the right thing
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_coalesces_small_shuffle(spark):
    """AQE must shrink the static 8-partition shuffle for a tiny agg —
    the mechanism that makes one config serve sf0.001 and 100 TB."""
    df = load(spark, SF_DIR, "nation").groupBy("n_regionkey").count()
    df.collect()
    n_parts = df.rdd.getNumPartitions()
    assert n_parts < 8  # coalesced below spark.sql.shuffle.partitions


def test_repartition_by_range_output_layout(spark, tmp_path):
    """Write-distribution control: repartitionByRange produces range-
    clustered output files (what a downstream sorted-merge reader or
    zone-map-pruning format wants)."""
    out = str(tmp_path / "ranged")
    orders = load(spark, SF_DIR, "orders")
    orders.repartitionByRange(4, "o_orderdate").write.parquet(out)
    import glob

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    # each file covers a disjoint date range
    ranges = []
    for f in files:
        mm = spark.read.parquet(f).agg(
            F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
        ).collect()[0]
        ranges.append((mm.lo, mm.hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_coalesce_controls_file_count(spark, tmp_path):
    out = str(tmp_path / "one")
    load(spark, SF_DIR, "nation").coalesce(1).write.parquet(out)
    import glob

    assert len(glob.glob(out + "/part-*.parquet")) == 1
