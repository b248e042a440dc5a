"""Projections, filters, predicates (SURVEY.md §2B q01-q06) and the
flagship daily-rollup query (§7 Phase 1).

These generalize the reference producer's source-side semantics: its API
query string pushes predicates to the source (`-is:retweet lang:en
-%23nbatopshot`, reference main.py:89, 99), its `tweet.fields` is a
projection (main.py:90), and its lookback bound is a range filter
(main.py:262-263).  Expressed declaratively, Catalyst pushes every one of
these into the parquet scan (PushedFilters / ReadSchema — asserted in
tests/test_plans.py), which is the 100 TB-scale equivalent of the
reference's "filter at the API" design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.functions.num import (
    dsum_pos,
    qavg_pos,
    qint,
    sql_dsum_pos,
    sql_qavg_pos,
    sql_qint,
)
from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


# --- flagship: daily fan-engagement rollup -------------------------------
# The reference's core analytic shape: per-day, per-category volume+value
# rollup over the fact stream (its daily crawl run, main.tf:214-218,
# aggregated downstream in Athena).  On the fixtures: lineitem ⋈ orders,
# bounded date range, group by day+flag, ordered, capped (the MAX_RESULTS
# cap, main.py:136, generalized as LIMIT).
@query(
    "q00_flagship_daily_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', o.o_orderdate) AS DATE) AS order_day,
           l.l_returnflag AS returnflag,
           COUNT(*) AS n_items,
           {sum_qty} AS sum_qty,
           {sum_rev} AS sum_revenue,
           {avg_price} AS avg_price_e6
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1, 2
    ORDER BY sum_revenue DESC, order_day, returnflag
    LIMIT 100
    """.format(
        sum_qty=sql_dsum_pos("l.l_quantity"),
        sum_rev=sql_dsum_pos("l.l_extendedprice * (1 - l.l_discount)"),
        avg_price=sql_qavg_pos("l.l_extendedprice"),
    ),
)
def q00_flagship_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.to_date("o_orderdate").alias("order_day"),
            F.col("l_returnflag").alias("returnflag"),
        )
        .agg(
            F.count("*").alias("n_items"),
            dsum_pos("l_quantity").alias("sum_qty"),
            dsum_pos(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_revenue"),
            qavg_pos("l_extendedprice").alias("avg_price_e6"),
        )
        .orderBy(F.col("sum_revenue").desc(), "order_day", "returnflag")
        .limit(100)
    )


# --- q01: projection / aliasing / computed columns (P5, main.py:90) ------
@query(
    "q01_project",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand,
           CAST(floor(p_retailprice * 0.9 * 1e6 + 0.5) AS BIGINT) AS sale_price_e6,
           p_size * 2 AS double_size
    FROM part
    """,
)
def q01_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand"),
        qint(F.col("p_retailprice") * 0.9).alias("sale_price_e6"),
        (F.col("p_size") * 2).alias("double_size"),
    )


# --- q02: comparison/boolean/range predicates (P2+P3, main.py:89, 263) ---
@query(
    "q02_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '2000-01-01' AND TIMESTAMP '2000-03-31'
      AND l_quantity > 40
      AND (l_returnflag = 'R' OR l_discount < 0.02)
      AND NOT l_linestatus = 'O'
    """,
)
def q02_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("2000-01-01", "2000-03-31")
        & (F.col("l_quantity") > 40)
        & ((F.col("l_returnflag") == "R") | (F.col("l_discount") < 0.02))
        & (~(F.col("l_linestatus") == "O"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


# --- q03: IN-list (alias expansion, reference nba.yaml:6-7 + main.py:173)
@query(
    "q03_inlist",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_nationkey
    FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
      AND c_nationkey IN (1, 3, 5, 7, 9, 11)
    """,
)
def q03_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
            & F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11)
        )
        .select("c_custkey", "c_mktsegment", "c_nationkey")
    )


# --- q04: LIKE / regex (topic & hashtag matching, main.py:89, 99) --------
@query(
    "q04_like",
    oracle=r"""
    SELECT p_partkey, p_type, p_brand
    FROM part
    WHERE p_type LIKE '%ECONOMY%'
       OR regexp_matches(p_brand, 'Brand#[12]$')
    """,
)
def q04_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type").like("%ECONOMY%") | F.col("p_brand").rlike("Brand#[12]$"))
        .select("p_partkey", "p_type", "p_brand")
    )


# --- q05: NULL handling (nullif/coalesce/isnull) --------------------------
@query(
    "q05_null",
    oracle="""
    SELECT COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_was_null
    FROM orders
    GROUP BY 1
    """,
)
def q05_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.groupBy(
        F.coalesce(status_np, F.lit("PENDING")).alias("status")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.when(status_np.isNull(), 1).otherwise(0)).alias("n_was_null"),
    )


# --- q06: CASE WHEN --------------------------------------------------------
@query(
    "q06_case",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_band,
           o_orderpriority,
           COUNT(*) AS n,
           {sum_price} AS sum_price
    FROM orders
    GROUP BY 1, 2
    """.format(sum_price=sql_dsum_pos("o_totalprice")),
)
def q06_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return o.groupBy(band.alias("price_band"), "o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum_pos("o_totalprice").alias("sum_price"),
    )


# --- q49: table-function source (range/generate_series) ----------------------
@query(
    "q49_range_source",
    oracle="""
    SELECT CAST(r.range AS BIGINT) AS n,
           CAST(r.range * r.range AS BIGINT) AS n_sq,
           CAST(r.range % 10 AS BIGINT) AS bucket
    FROM range(0, 10000) r
    """,
)
def q49_range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic table-function source: spark.range is the idiomatic way
    to generate distributed test/probe data (it parallelizes across the
    cluster; no driver-side list materialization)."""
    return spark.range(0, 10000).select(
        F.col("id").alias("n"),
        (F.col("id") * F.col("id")).alias("n_sq"),
        (F.col("id") % 10).alias("bucket"),
    )
