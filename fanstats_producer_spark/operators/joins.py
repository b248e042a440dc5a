"""Join operators (SURVEY.md §2B q10-q15).

The reference's only "join" is config-topics × fetched-posts (a broadcast
of a tiny dimension, reference main.py:173 + nba.yaml:6-7); everything
else is Athena-delegated.  Scale posture: small dimensions (region,
nation, config topics) are explicitly `broadcast()`-hinted so no shuffle
of the fact side ever happens for them; large-large joins go through
sort-merge with AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.functions.num import dsum_pos, sql_dsum_pos
from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


# --- q10: inner equi-join --------------------------------------------------
@query(
    "q10_join_inner",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_orders, {sum_price} AS sum_price
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """.format(sum_price=sql_dsum_pos("o.o_totalprice")),
)
def q10_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum_pos("o_totalprice").alias("sum_price"))
    )


# --- q11: outer joins ------------------------------------------------------
@query(
    "q11_join_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def q11_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --- q12: left semi / left anti --------------------------------------------
@query(
    "q12_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_urgent' AS tag FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c_custkey, 'no_urgent' AS tag FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def q12_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_urgent").alias("tag")
    )
    anti = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_urgent").alias("tag")
    )
    return semi.unionByName(anti)


# --- q13: broadcast join of small dimensions (the config-topics pattern) ---
@query(
    "q13_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q13_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    # Dimension tables are tiny (25 + 5 rows at any SF): broadcast both so
    # the customer side never shuffles — at 100 TB this is the difference
    # between a map-side join and a full-fact shuffle.
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


# --- q14: multi-way star join ----------------------------------------------
@query(
    "q14_star",
    oracle="""
    SELECT r.r_name,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_items,
           {revenue} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """.format(revenue=sql_dsum_pos("l.l_extendedprice * (1 - l.l_discount)")),
)
def q14_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("n_items"),
            dsum_pos(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# --- q15: theta / range join -----------------------------------------------
_BANDS = [
    ("budget", 0.0, 500.0),
    ("mid", 500.0, 1200.0),
    ("premium", 1200.0, 10000.0),
]


@query(
    "q15_range_join",
    oracle="""
    SELECT b.band, COUNT(*) AS n_parts, {sum_price} AS sum_price
    FROM part p
    JOIN (VALUES ('budget', 0.0, 500.0),
                 ('mid', 500.0, 1200.0),
                 ('premium', 1200.0, 10000.0)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY 1
    """.format(sum_price=sql_dsum_pos("p.p_retailprice")),
)
def q15_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    # VALUES → LocalRelation: stays JVM-side (createDataFrame would route
    # the literals through a Python RDD scan — measured ~1s of pure
    # overhead per query at any scale).
    values = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)
    bands = F.broadcast(
        spark.sql(f"SELECT * FROM (VALUES {values}) AS b(band, lo, hi)")
    )
    # Non-equi join: with the band side broadcast, Spark plans a
    # BroadcastNestedLoopJoin — fact side streams once, no shuffle.
    return (
        p.join(bands, (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), dsum_pos("p_retailprice").alias("sum_price"))
    )


# --- q11b: full outer join ---------------------------------------------------
@query(
    "q11b_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def q11b_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer: nations appearing on either side survive with
    zero-filled counts (supplier has 10 rows → most nations customer-only)."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


# --- q51: big-big interval-overlap join via bin bucketing ------------------------
# q15's band join broadcasts a tiny range table; when BOTH interval sets
# are large (100 TB of sessions x incident windows) a nested-loop join is
# quadratic and a broadcast impossible.  The scale answer is bin
# bucketing: each interval explodes to the fixed-width bins it spans, the
# join becomes an equi-join on bin, and the true overlap predicate
# filters within the bin.  Each overlapping pair shares exactly the bin
# of max(start_a, start_b), so requiring bin == that value emits every
# pair exactly once — no distinct pass.  Shuffle is by bin: bounded
# fan-out (interval_len / bin_size + 1 rows per interval), even
# partitioning as long as bin_size tracks the typical interval length.
_Q51_BIN = 600  # seconds; = the longer interval length


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bin_size: int = _Q51_BIN,
) -> DataFrame:
    """Overlap-join two interval sets carrying (id, start, end) in epoch
    seconds, half-open [start, end).  Returns one row per overlapping
    (a_id, b_id) pair via bin-bucketed equi-join."""

    def binned(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col("id").alias(f"{prefix}_id"),
            F.col("start").alias(f"{prefix}_start"),
            F.col("end").alias(f"{prefix}_end"),
            F.explode(
                F.sequence(
                    (F.col("start") / bin_size).cast("long"),
                    ((F.col("end") - 1) / bin_size).cast("long"),
                )
            ).alias("bin"),
        )

    ab = binned(a, "a")
    bb = binned(b, "b")
    overlap = (F.col("a_start") < F.col("b_end")) & (
        F.col("b_start") < F.col("a_end")
    )
    emit_once = F.col("bin") == (
        F.greatest("a_start", "b_start") / bin_size
    ).cast("long")
    return (
        ab.join(bb, "bin")
        .filter(overlap & emit_once)
        .select("a_id", "b_id")
    )


@query(
    "q51_interval_join",
    oracle="""
    WITH a AS (SELECT event_id AS id, CAST(floor(epoch(ts)) AS BIGINT) AS s
               FROM events WHERE event_type = 'error'),
         b AS (SELECT event_id AS id, CAST(floor(epoch(ts)) AS BIGINT) AS s
               FROM events WHERE event_type = 'purchase')
    SELECT a.id AS a_id, b.id AS b_id
    FROM a JOIN b ON a.s < b.s + 300 AND b.s < a.s + 600
    """,
)
def q51_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which purchases fall inside a 10-minute error window?  Error
    events open [ts, ts+600s), purchases [ts, ts+300s); pairs overlap."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("ts").cast("long").alias("s")
    )
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id"),
        F.col("s").alias("start"),
        (F.col("s") + 600).alias("end"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id"),
        F.col("s").alias("start"),
        (F.col("s") + 300).alias("end"),
    )
    return interval_overlap_join(a, b)
