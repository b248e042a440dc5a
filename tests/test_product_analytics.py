"""Semantics tests for the product-analytics operators (q55-q57):
ordering constraints and gap boundaries that the oracle's fixture data
may not exercise adversarially.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _events_dir(spark, tmp_path, rows):
    """Write a tiny events fixture in the testdata layout (ts = epoch
    nanos, the TIMESTAMP(NANOS) shape io.load converts)."""
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.unix_micros(F.to_timestamp("ts")) * 1000)
    out = str(tmp_path / "sf_ev")
    os.makedirs(out, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def test_funnel_requires_stage_order(spark, tmp_path):
    """A click BEFORE the user's first view must not convert stage 2."""
    from fanstats_producer_spark.operators.product_analytics import q55_funnel

    rows = [
        # user 1: proper order view -> click -> purchase
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, None),
        (2, "2024-01-01 10:05:00", 1, "click", 1.0, None),
        (3, "2024-01-01 10:10:00", 1, "purchase", 1.0, None),
        # user 2: click precedes the only view -> stage 1 only
        (4, "2024-01-01 09:00:00", 2, "click", 1.0, None),
        (5, "2024-01-01 11:00:00", 2, "view", 1.0, None),
        # user 3: view then click, purchase before click -> stages 1-2
        (6, "2024-01-01 08:00:00", 3, "view", 1.0, None),
        (7, "2024-01-01 08:30:00", 3, "click", 1.0, None),
        (8, "2024-01-01 08:10:00", 3, "purchase", 1.0, None),
    ]
    out = q55_funnel(spark, _events_dir(spark, tmp_path, rows)).collect()
    got = {r.stage: r.n_users for r in out}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_sessionize_gap_boundary(spark, tmp_path):
    """A gap of exactly the threshold stays in-session; one second more
    splits."""
    from fanstats_producer_spark.operators.product_analytics import (
        q57_sessionize,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, None),
        (2, "2024-01-01 10:30:00", 1, "view", 1.0, None),  # exactly 30 min
        (3, "2024-01-01 11:00:01", 1, "view", 1.0, None),  # 30 min + 1 s
        (4, "2024-01-01 11:00:02", 1, "view", 1.0, None),
    ]
    out = q57_sessionize(spark, _events_dir(spark, tmp_path, rows)).collect()
    sessions = sorted((r.session_seq, r.n_events) for r in out)
    assert sessions == [(1, 2), (2, 2)]


def test_cohort_week_zero_contains_every_user(spark, tmp_path):
    """Every user is active in their own cohort week (offset 0), and
    later activity lands at positive offsets."""
    from fanstats_producer_spark.operators.product_analytics import q56_cohort

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, None),  # Mon wk1
        (2, "2024-01-10 10:00:00", 1, "view", 1.0, None),  # wk2 -> offset 1
        (3, "2024-01-03 10:00:00", 2, "view", 1.0, None),  # Wed wk1
    ]
    out = q56_cohort(spark, _events_dir(spark, tmp_path, rows)).collect()
    got = {(str(r.cohort_week), r.week_offset): r.n_active for r in out}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1}
