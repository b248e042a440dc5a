"""Physical-plan shape tests (SURVEY.md §4): the perf properties the
100 TB design depends on, asserted from the executed plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from fanstats_producer_spark import registry
from fanstats_producer_spark.io import load
from fanstats_producer_spark.plans import checks


def test_filter_pushdown_reaches_scan(spark):
    """P2's source-side predicates: Catalyst must push them to parquet."""
    li = load(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") > 40).select(
        "l_orderkey", "l_quantity"
    )
    pushed = checks.pushed_filters(li)
    assert "l_quantity" in pushed
    assert "GreaterThan" in pushed


def test_column_pruning_reaches_scan(spark):
    """P5's tweet.fields projection: a 2-column select must not scan 11."""
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    rs = checks.read_schema(li)
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs


def test_small_dim_join_broadcasts(spark):
    """q13: region/nation joins must be broadcast, never a fact shuffle."""
    df = registry.QUERIES["q13_broadcast"](spark, SF_DIR)
    assert checks.has_broadcast_join(df)
    assert not checks.has_sort_merge_join(df)


def test_flagship_join_is_broadcast_after_selective_filter(spark):
    """q00: the date-filtered orders side is small; AQE/static planning
    should broadcast it rather than shuffling lineitem."""
    df = registry.QUERIES["q00_flagship_daily_rollup"](spark, SF_DIR)
    assert checks.has_broadcast_join(df)


def test_partition_pruning(spark):
    """q40: the date filter must prune partition directories."""
    df = registry.QUERIES["q40_partition_prune"](spark, SF_DIR)
    df.collect()  # materialize so scan metrics exist
    assert "event_date" in checks.partition_filters(df)
    metrics = checks.scan_metrics(df)
    assert metrics, "no scan node found"
    assert 0 < metrics[0]["numPartitions"] <= 3  # 3 days selected of ~30


def test_global_topk_avoids_total_sort(spark):
    """q34: ORDER BY + LIMIT must plan TakeOrderedAndProject."""
    df = registry.QUERIES["q34_sort"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in checks.explain_str(df, "simple")


def test_whole_stage_codegen_covers_agg(spark):
    """q20 must execute inside WholeStageCodegen spans (JVM hot path)."""
    df = registry.QUERIES["q20_agg"](spark, SF_DIR)
    df.collect()  # AQE finalizes the plan on execution
    assert checks.whole_stage_codegen_ids(df) >= 1
