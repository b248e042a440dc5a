"""As-of join (SURVEY.md §2B q16): event ↔ nearest prior event.

Spark has no built-in ASOF JOIN, so this is a composition: tag both sides,
union, and take ``last(..., ignorenulls=True)`` over a window ordered by
(ts, side) per key.  Crucially this is the *scalable* formulation — one
shuffle on the key, linear scan per key — instead of the naive
inequality join (``r.ts <= l.ts``) whose intermediate blows up
quadratically per key and cannot be hash-partitioned.  At 100 TB the
union-window plan is a single sort-merge pass; the inequality-join plan
is a broadcast-nested-loop disaster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """Generic as-of join: for each left row, attach the most recent right
    row (right.ts <= left.ts) per key.  Right-side ties broken by the
    last value in ``right_values`` order after (ts) — callers should
    include a unique column for determinism.

    Returns left columns + ``right_values`` (null when no prior right row).
    """
    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_values],
        F.struct(*left.columns).alias("__left_row"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in right_values],
        F.lit(None).cast(lhs.schema["__left_row"].dataType).alias("__left_row"),
    )
    # Order right rows before left rows at equal ts (<= semantics); within
    # right rows at equal ts, the struct max over ordering keys decides.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", *[f"__r_{v}" for v in right_values])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lhs.unionByName(rhs)
    for v in right_values:
        u = u.withColumn(f"__r_{v}", F.last(f"__r_{v}", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1).select(
        F.col("__left_row.*"),
        *[F.col(f"__r_{v}").alias(f"asof_{v}") for v in right_values],
    )
    return out


_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@query(
    "q16_asof",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id, p.user_id,
                  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
                  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts,
                  row_number() OVER (
                    PARTITION BY p.event_id
                    ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
                  ) AS rn
           FROM p LEFT JOIN c
             ON c.user_id = p.user_id AND c.ts <= p.ts)
    SELECT event_id, user_id, purchase_ts, last_click_ts
    FROM j WHERE rn = 1
    """,
)
def q16_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["ts", "event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.date_format("asof_ts", _TS_FMT).alias("last_click_ts"),
    )
