"""Classic TPC-H-shaped multi-join analytics (Q3/Q5/Q10 analogs) over
the fixture star schema.

The reference's Athena layer is exactly this class of SQL (SURVEY.md
§2B: the delegated analyst query path over the crawled catalog); these
three anchor the multi-join/agg surface with the canonical decision-
support shapes: shipping-priority top-k (Q3), region-local supplier
volume (Q5), and returned-item revenue ranking (Q10).

Plan posture: dims broadcast (region/nation/customer at any realistic
scale factor for nation/region; customer broadcasts here and bucket-
joins at 100 TB), facts shuffle once on the join key, aggregates are
partial before the exchange, and the top-k is TakeOrderedAndProject —
no global sort.  Revenue sums use the exact decimal path (functions/
num.py) quantized to integer cents so both engines hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.functions.num import qint, sql_qint
from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query

_REV = "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))"


def _rev() -> F.Column:
    return F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    )


# --- q62: TPC-H Q3 analog (shipping priority) ---------------------------------
@query(
    "q62_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_qint(_REV, 2)} AS revenue_e2,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_e2 DESC, l_orderkey
    LIMIT 10
    """,
)
def q62_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(qint(_rev(), 2).alias("revenue_e2"))
        .select(
            "l_orderkey",
            "revenue_e2",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue_e2").desc(), "l_orderkey")
        .limit(10)
    )


# --- q63: TPC-H Q5 analog (local supplier volume) -----------------------------
@query(
    "q63_tpch_q5",
    oracle=f"""
    SELECT n_name, {sql_qint(_REV, 2)} AS revenue_e2
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    ORDER BY revenue_e2 DESC, n_name
    """,
)
def q63_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(qint(_rev(), 2).alias("revenue_e2"))
        .orderBy(F.col("revenue_e2").desc(), "n_name")
    )


# --- q64: TPC-H Q10 analog (returned-item revenue) ----------------------------
@query(
    "q64_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_qint(_REV, 2)} AS revenue_e2, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_e2 DESC, c_custkey
    LIMIT 20
    """,
)
def q64_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1998-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(qint(_rev(), 2).alias("revenue_e2"))
        .select("c_custkey", "c_name", "revenue_e2", "n_name")
        .orderBy(F.col("revenue_e2").desc(), "c_custkey")
        .limit(20)
    )


# --- q67: TPC-H Q18 analog (large-volume orders) ------------------------------
_Q18_QTY = 150


@query(
    "q67_tpch_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY 1
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > {_Q18_QTY})
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           {sql_qint("o_totalprice", 2)} AS totalprice_e2,
           {sql_qint("SUM(CAST(l_quantity AS DECIMAL(18,6)))", 2)} AS sum_qty_e2
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice_e2 DESC, o_orderkey
    LIMIT 100
    """,
)
def q67_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: customers with large-volume orders — the
    canonical high-cardinality aggregate-then-semi-join shape (GROUP BY
    every order, HAVING on an exact decimal sum, semi join back to the
    facts).

    Plan: lineitem is scanned and shuffled exactly ONCE — the HAVING
    aggregate's per-order sum IS the output measure, so the classic
    re-join of lineitem after the semi join is dead work and is
    eliminated (the oracle keeps the textbook re-join shape; results are
    identical by construction).  The tiny qualifying-order frame then
    joins orders (broadcast at this SF, shuffle join on the clustered
    key at 100 TB), customer broadcasts, and the top-k is
    TakeOrderedAndProject."""
    from fanstats_producer_spark.functions.num import dsum_pos

    li = load(spark, sf_dir, "lineitem")
    # split-accumulator exact sum (functions/num.py): ~1.5x faster than
    # the decimal cast on this 150k-group aggregate, same exact value
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum_pos("l_quantity").alias("sq"))
        .filter(F.col("sq") > _Q18_QTY)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            qint("o_totalprice", 2).alias("totalprice_e2"),
            qint(F.col("sq").cast("double"), 2).alias("sum_qty_e2"),
        )
        .orderBy(F.col("totalprice_e2").desc(), "o_orderkey")
        .limit(100)
    )


# --- q71: TPC-H Q6 analog (forecasting revenue change) ---------------------------
@query(
    "q71_tpch_q6",
    oracle="""
    SELECT {rev} AS revenue_e2,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """.format(
        rev=sql_qint("SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))", 2)
    ),
)
def q71_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q71: TPC-H Q6 adapted to the fixture dates — the canonical
    full-scan scalar aggregate.  Every predicate (date range, discount
    band, quantity cap) pushes into the parquet scan (PushedFilters),
    the projection prunes to three columns, and the single partial+
    final aggregation returns one row — the query whose entire cost is
    the scan, which is exactly what pushdown and column pruning are
    for.  Revenue sums in decimal(18,6) (exact, order-free) quantized
    to integer cents."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        qint(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,6)"
                )
            ),
            2,
        ).alias("revenue_e2"),
        F.count("*").alias("n_items"),
    )
