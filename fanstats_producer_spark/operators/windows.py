"""Window functions, sorts, top-k (SURVEY.md §2B q30-q34).

Every window here is partitioned (never a global ORDER BY window) — a
global window is a single-task bottleneck at scale.  Global top-k goes
through orderBy().limit(k), which Spark plans as TakeOrderedAndProject
(per-partition heaps + driver merge, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fanstats_producer_spark.functions.num import DEC, qint
from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


# --- q30: ranking functions -------------------------------------------------
@query(
    "q30_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(row_number() OVER w AS INT) AS rn,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q30_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --- q31: lag / lead ---------------------------------------------------------
@query(
    "q31_lag",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor((value - lag(value) OVER w) * 1e6 + 0.5) AS BIGINT)
             AS delta_prev_e6,
           CAST(floor((lead(value) OVER w - value) * 1e6 + 0.5) AS BIGINT)
             AS delta_next_e6,
           first_value(event_type) OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q31_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        qint(v - F.lag("value").over(w)).alias("delta_prev_e6"),
        qint(F.lead("value").over(w) - v).alias("delta_next_e6"),
        F.first("event_type").over(w).alias("first_type"),
    )


# --- q32: running totals / moving averages (frames) -------------------------
@query(
    "q32_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           CAST(floor(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / (COUNT(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) * 1e6 + 0.5) AS BIGINT)
             AS moving_avg4_e6
    FROM events
    """,
)
def q32_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = wo.rowsBetween(-3, Window.currentRow)
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(running).cast("double").alias("running_value"),
        qint(
            F.sum(F.col("value").cast(DEC)).over(moving).cast("double")
            / F.count("value").over(moving)
        ).alias("moving_avg4_e6"),
    )


# --- q33: top-N per group ----------------------------------------------------
@query(
    "q33_topn_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q33_topn_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# --- q34: multi-key sort, nulls placement, global top-k ----------------------
@query(
    "q34_sort",
    oracle="""
    SELECT o_orderkey, o_orderpriority, status_np
    FROM (SELECT o_orderkey, o_orderpriority, NULLIF(o_orderstatus, 'P') AS status_np
          FROM orders)
    ORDER BY status_np DESC NULLS LAST, o_orderpriority ASC, o_orderkey ASC
    LIMIT 50
    """,
)
def q34_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"),
    )
    # Spark plans this as TakeOrderedAndProject: no global sort at scale.
    return o.orderBy(
        F.col("status_np").desc_nulls_last(),
        F.col("o_orderpriority").asc(),
        F.col("o_orderkey").asc(),
    ).limit(50)


# --- q32b: interval RANGE frame (time-based sliding aggregate) ---------------
@query(
    "q32b_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW) AS n_last_hour
    FROM events
    """,
)
def q32b_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on event time: per-row trailing 1-hour count —
    the batch analogue of a sliding stream window, and a frame type
    rowsBetween cannot express (ties + variable density)."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("q32b_events")
    return ev.sparkSession.sql(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                        AND CURRENT ROW) AS n_last_hour
        FROM q32b_events
        """
    )


# --- q30b: distribution window functions -------------------------------------
@query(
    "q30b_distribution",
    oracle="""
    SELECT c_custkey,
           CAST(floor(percent_rank() OVER w * 1e6 + 0.5) AS BIGINT)
             AS pct_rank_e6,
           CAST(floor(cume_dist() OVER w * 1e6 + 0.5) AS BIGINT) AS cume_e6,
           nth_value(c_custkey, 3) OVER (PARTITION BY c_mktsegment
                                         ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING)
             AS third_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q30b_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        qint(F.percent_rank().over(w)).alias("pct_rank_e6"),
        qint(F.cume_dist().over(w)).alias("cume_e6"),
        F.nth_value("c_custkey", 3).over(w_full).alias("third_richest"),
    )


# --- q54: quantile bucketing (ntile + explicit width buckets) ------------------
_Q54_NT = 4
_Q54_NB = 5


@query(
    "q54_ntile_bucket",
    oracle=f"""
    WITH b AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(ntile({_Q54_NT}) OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal, c_custkey) AS INT)
               AS quartile,
             CAST(least({_Q54_NB} - 1, greatest(0,
               floor((c_acctbal - min_b) * {_Q54_NB} / (max_b - min_b))))
               AS INT) + 1 AS bucket
      FROM (SELECT *,
              min(c_acctbal) OVER () AS min_b,
              max(c_acctbal) OVER () AS max_b
            FROM customer))
    SELECT c_mktsegment, quartile, bucket,
           COUNT(*) AS n,
           CAST(MIN(c_acctbal) AS DOUBLE) AS lo,
           CAST(MAX(c_acctbal) AS DOUBLE) AS hi
    FROM b GROUP BY 1, 2, 3
    """,
)
def q54_ntile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bucketing two ways: rank-based quartiles (ntile — equal
    COUNT per bucket, needs a sort) and value-based width buckets
    (equal RANGE per bucket — a pure map-side expression once the global
    min/max are known).  At 100 TB the width-bucket arm is the scalable
    histogram: min/max is one tiny aggregate, then bucketing shuffles
    only the (segment, bucket) partials; ntile's total order is the
    expensive path and stays partitioned by segment."""
    c = load(spark, sf_dir, "customer")
    mm = c.agg(
        F.min("c_acctbal").alias("min_b"), F.max("c_acctbal").alias("max_b")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    b = (
        c.crossJoin(F.broadcast(mm))
        .withColumn("quartile", F.ntile(_Q54_NT).over(w))
        .withColumn(
            "bucket",
            F.least(
                F.lit(_Q54_NB - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("c_acctbal") - F.col("min_b"))
                        * _Q54_NB
                        / (F.col("max_b") - F.col("min_b"))
                    ),
                ),
            ).cast("int")
            + 1,
        )
    )
    return b.groupBy("c_mktsegment", "quartile", "bucket").agg(
        F.count("*").alias("n"),
        F.min("c_acctbal").cast("double").alias("lo"),
        F.max("c_acctbal").cast("double").alias("hi"),
    )


# --- q81: running COUNT(DISTINCT) over an ordered window ------------------------
# The one windowed aggregate ANSI engines support that Spark's
# WindowExec does NOT take directly: COUNT(DISTINCT x) OVER (ORDER BY
# ...).  The Spark-native formulation is size(collect_set(x) OVER w) —
# same semantics, and the set state is bounded by the DISTINCT domain
# (event types here), not the frame length, so the translation is safe
# exactly when the distinct domain is small (the usual case for a
# "how many distinct actions so far" product metric).  Partitioned by
# user, ordered by (ts, event_id) for a total order within each key —
# no global sort, no single-partition window.  Output bounded to the
# 5%-user slice so the parity check stays small at every SF.
@query(
    "q81_window_distinct",
    oracle="""
    SELECT event_id, user_id,
           COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS distinct_types_so_far
    FROM events WHERE user_id % 20 = 0
    """,
)
def q81_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    return ev.selectExpr(
        "event_id",
        "user_id",
        "size(collect_set(event_type) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        " CURRENT ROW)) AS distinct_types_so_far",
    ).withColumn(
        "distinct_types_so_far",
        F.col("distinct_types_so_far").cast("long"),
    )
