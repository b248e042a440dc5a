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
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join: for each left row, attach the nearest right
    row per key — most recent prior (``direction="backward"``:
    right.ts <= left.ts) or earliest following (``"forward"``:
    right.ts >= left.ts).  Right-side ties broken by the ``right_values``
    order after (ts) — callers should include a unique column for
    determinism.  ``tolerance`` (an interval Column, e.g.
    ``F.expr("INTERVAL 1 HOUR")``) nulls the match when the matched
    right timestamp is farther than that from the left timestamp.

    Both directions are the same one-shuffle union-window plan: backward
    takes ``last(..., ignorenulls)`` over the preceding frame, forward
    takes ``first(..., ignorenulls)`` over the following frame.

    Returns left columns + ``right_values`` (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    back = direction == "backward"
    # Side ordering at equal ts keeps the inclusive semantics: backward
    # wants same-ts right rows BEFORE the left row (inside the preceding
    # frame); forward wants them AFTER it (inside the following frame).
    left_side, right_side = (1, 0) if back else (0, 1)
    vals = ["__match_ts", *[f"__r_{v}" for v in right_values]]
    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__match_ts"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_values],
        F.struct(*left.columns).alias("__left_row"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.col(right_ts).alias("__match_ts"),
        *[F.col(v).alias(f"__r_{v}") for v in right_values],
        F.lit(None).cast(lhs.schema["__left_row"].dataType).alias("__left_row"),
    )
    order = ["__ts", "__side", *[f"__r_{v}" for v in right_values]]
    if back:
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    u = lhs.unionByName(rhs)
    for v in vals:
        u = u.withColumn(v, pick(v).over(w))
    out = u.filter(F.col("__side") == left_side)
    if tolerance is not None:
        gap_ok = (
            (F.col("__ts") - F.col("__match_ts") <= tolerance)
            if back
            else (F.col("__match_ts") - F.col("__ts") <= tolerance)
        )
        for v in right_values:
            out = out.withColumn(
                f"__r_{v}", F.when(gap_ok, F.col(f"__r_{v}"))
            )
    return out.select(
        F.col("__left_row.*"),
        *[F.col(f"__r_{v}").alias(f"asof_{v}") for v in right_values],
    )


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


@query(
    "q16b_asof_forward",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id, p.user_id,
                  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
                  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS next_click_ts,
                  row_number() OVER (
                    PARTITION BY p.event_id
                    ORDER BY c.ts ASC NULLS LAST, c.event_id ASC NULLS LAST
                  ) AS rn
           FROM p LEFT JOIN c
             ON c.user_id = p.user_id AND c.ts >= p.ts
                AND c.ts <= p.ts + INTERVAL 1 HOUR)
    SELECT event_id, user_id, purchase_ts, next_click_ts
    FROM j WHERE rn = 1
    """,
)
def q16b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: the EARLIEST click within one hour
    AFTER each purchase (response-latency semantics) — same
    one-shuffle union-window plan as q16, opposite frame direction,
    tolerance nulling the match past the horizon."""
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
        tolerance=F.expr("INTERVAL 1 HOUR"),
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.date_format("asof_ts", _TS_FMT).alias("next_click_ts"),
    )
