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

from fanstats_producer_spark.functions.num import (
    dsum,
    dsum_pos,
    qint,
    sql_dsum,
    sql_dsum_pos,
    sql_qint,
)
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


# --- q72: TPC-H Q1 analog (pricing summary report) ----------------------------
@query(
    "q72_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_qint(sql_dsum_pos("l_quantity"), 2)} AS sum_qty_e2,
           {sql_qint(sql_dsum_pos("l_extendedprice"), 2)} AS sum_base_e2,
           {sql_qint(sql_dsum_pos("l_extendedprice * (1 - l_discount)"), 2)}
             AS sum_disc_e2,
           {sql_qint(
               sql_dsum_pos("l_extendedprice * (1 - l_discount) * (1 + l_tax)"), 2
           )} AS sum_charge_e2,
           {sql_qint(f"{sql_dsum_pos('l_quantity')} / COUNT(*)", 6)} AS avg_qty_e6,
           {sql_qint(f"{sql_dsum_pos('l_extendedprice')} / COUNT(*)", 6)}
             AS avg_price_e6,
           {sql_qint(f"{sql_dsum_pos('l_discount')} / COUNT(*)", 6)} AS avg_disc_e6,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q72_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog (pricing summary report) adapted to the fixture
    dates — THE canonical scan-heavy grouped aggregate: one full pass
    over the fact table, eight aggregates over a 2-value x 2-value
    grouping key.

    Plan: the date predicate pushes into the parquet scan, projection
    prunes to the six measure columns, and every aggregate is partial
    (map-side) before one tiny exchange of <=9 groups — the query is
    pure scan + combine, which is exactly how it must look at 100 TB.
    All sums ride the split-accumulator exact path (functions/num.py
    dsum_pos: quantize each row at e6, sum 21-bit digit planes as plain
    longs inside whole-stage codegen, recombine in decimal per group),
    so Spark's partition-parallel sums match the single-threaded oracle
    bit-for-bit; averages divide two already-exact numbers."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            qint(dsum_pos("l_quantity"), 2).alias("sum_qty_e2"),
            qint(dsum_pos("l_extendedprice"), 2).alias("sum_base_e2"),
            qint(dsum_pos(disc), 2).alias("sum_disc_e2"),
            qint(dsum_pos(charge), 2).alias("sum_charge_e2"),
            qint(dsum_pos("l_quantity") / n, 6).alias("avg_qty_e6"),
            qint(dsum_pos("l_extendedprice") / n, 6).alias("avg_price_e6"),
            qint(dsum_pos("l_discount") / n, 6).alias("avg_disc_e6"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- q73: TPC-H Q14 analog (promotion effect) ---------------------------------
@query(
    "q73_tpch_q14",
    oracle=f"""
    SELECT {sql_qint(
        sql_dsum_pos(
            "CASE WHEN p_type = 'PROMO'"
            " THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
        ), 2
    )} AS promo_rev_e2,
           {sql_qint(sql_dsum_pos("l_extendedprice * (1 - l_discount)"), 2)}
             AS total_rev_e2,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q73_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog (promotion effect): one month of lineitem
    joined to part, conditional aggregation splitting PROMO revenue
    from total.  The promo share is trivially derivable from the two
    exact integer sums; emitting both sides instead of the engine-side
    division keeps the comparison integer-exact (no cross-engine
    decimal-division rounding surface).

    Plan: the month predicate pushes into the scan (tiny slice of the
    fact), part broadcasts (2 k rows here; at 100 TB part is still the
    small side of this join by 3 orders of magnitude), and both sums
    ride the exact split-accumulator path in one partial aggregate —
    zero wide shuffles."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        qint(dsum_pos(promo), 2).alias("promo_rev_e2"),
        qint(dsum_pos(rev), 2).alias("total_rev_e2"),
        F.count("*").alias("n_items"),
    )


# --- q74: TPC-H Q19 analog (discounted revenue, OR-of-ANDs) -------------------
@query(
    "q74_tpch_q19",
    oracle=f"""
    SELECT {sql_qint(sql_dsum_pos("l_extendedprice * (1 - l_discount)"), 2)}
             AS revenue_e2,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q74_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog (discounted revenue): the canonical OR-of-ANDs
    predicate spanning both join sides.

    Plan: Catalyst extracts the side-local residuals of the
    disjunction — part rows outside all three (brand, size) bands and
    lineitem rows outside quantity [1,30] are dropped BEFORE the join
    (visible as PushedFilters on both scans) — then the cross-side
    conjuncts evaluate as the join's non-equi residual.  Part
    broadcasts; the one exact sum is map-side partial.  At 100 TB this
    pre-join pruning is the difference between joining the full fact
    and joining ~2% of it."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bands = [
        ("Brand#4", 5, 1, 11),
        ("Brand#19", 10, 10, 20),
        ("Brand#25", 15, 20, 30),
    ]
    cond = None
    for brand, size_hi, q_lo, q_hi in bands:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = c if cond is None else (cond | c)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            qint(dsum_pos(rev), 2).alias("revenue_e2"),
            F.count("*").alias("n_items"),
        )
    )


# --- q75: TPC-H Q17 analog (small-quantity-order revenue) ---------------------
@query(
    "q75_tpch_q17",
    oracle=f"""
    WITH pl AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#4' AND p_type = 'ECONOMY'),
    st AS (
      SELECT l_partkey, COUNT(*) AS cnt,
             {sql_dsum_pos("l_quantity")} AS sq
      FROM pl GROUP BY l_partkey)
    SELECT {sql_qint(sql_dsum_pos("l_extendedprice"), 2)} AS small_rev_e2,
           COUNT(*) AS n_items
    FROM pl JOIN st USING (l_partkey)
    WHERE l_quantity * 5.0 * cnt < sq
    """,
)
def q75_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog (small-quantity-order revenue): lineitems whose
    quantity is below 20% of their part's average order quantity, for
    one brand/type slice — the canonical correlated-average shape.

    The threshold comparison is stated multiplicatively
    (``qty * 5 * cnt < sum_qty``) instead of dividing out the average:
    every operand is an exactly-representable double (integral fixture
    quantities, exact split-accumulator sum), so the predicate is
    engine-independent with no division-rounding boundary.

    Plan: the filtered part slice broadcasts and prunes lineitem to the
    matched rows FIRST; the pruned frame is materialized eagerly
    (localCheckpoint — it is bounded by the part slice, ~0.5% of the
    fact, and feeds BOTH the stats aggregate and the threshold filter,
    so without the checkpoint the fact scan would execute twice); the
    per-part (count, exact-sum) stats then broadcast back onto it — the
    fact is scanned once and the rejoin is a broadcast, not a
    shuffle."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_type") == "ECONOMY")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pl = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .localCheckpoint(eager=True)
    )
    stats = pl.groupBy("l_partkey").agg(
        F.count("*").alias("cnt"), dsum_pos("l_quantity").alias("sq")
    )
    return pl.join(
        F.broadcast(stats.withColumnRenamed("l_partkey", "s_partkey")),
        F.col("l_partkey") == F.col("s_partkey"),
    ).filter(
        F.col("l_quantity") * 5.0 * F.col("cnt") < F.col("sq")
    ).agg(
        qint(dsum_pos("l_extendedprice"), 2).alias("small_rev_e2"),
        F.count("*").alias("n_items"),
    )


# --- q76: TPC-H Q7 analog (volume shipping between two nations) ---------------
_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"


@query(
    "q76_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {sql_qint(sql_dsum_pos("l_extendedprice * (1 - l_discount)"), 2)}
             AS revenue_e2
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
        OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q76_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog (volume shipping): revenue flowing between an
    ordered pair of nations, by supplier nation x customer nation x
    ship year.

    Plan: the two-nation filter applies to supplier AND customer BEFORE
    their joins (each side can only match one of the two names — the
    cross-side either/or residual evaluates after), so both dims arrive
    pre-pruned and broadcast; lineitem joins orders on the clustered
    key (the one big shuffle at scale) and everything else is
    broadcast + map-side partial aggregation."""
    nation = load(spark, sf_dir, "nation")
    pair = nation.filter(F.col("n_name").isin(_Q7_N1, _Q7_N2))
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            qint(
                dsum_pos(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue_e2")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- q77: TPC-H Q8 analog (national market share) ------------------------------
@query(
    "q77_tpch_q8",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {sql_qint(
               sql_dsum_pos(
                   "CASE WHEN n2.n_name = 'NATION_3'"
                   " THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
               ), 2
           )} AS nation_vol_e2,
           {sql_qint(sql_dsum_pos("l_extendedprice * (1 - l_discount)"), 2)}
             AS total_vol_e2
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA'
      AND p_type = 'STANDARD'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q77_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog (national market share): of the STANDARD-part
    volume sold into AMERICA-region customers over two years, how much
    was supplied by NATION_3 — by order year.  The share is the ratio
    of the two exact integer sums; emitting both sides keeps the
    comparison integer-exact (q73's pattern — no cross-engine
    decimal-division surface).

    Plan: part (filtered), supplier+nation (the market-share flag
    becomes a broadcast-mapped boolean), and customer-nation-region
    (region-pruned) all broadcast; the only wide work is lineitem
    joining orders on the clustered key, then one partial aggregate
    over <=2 year groups."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    am_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("am_nationkey"))
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(am_nations), F.col("c_nationkey") == F.col("am_nationkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", (F.col("n_name") == "NATION_3").alias("is_target"))
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            qint(dsum_pos(F.when(F.col("is_target"), vol).otherwise(0.0)), 2).alias(
                "nation_vol_e2"
            ),
            qint(dsum_pos(vol), 2).alias("total_vol_e2"),
        )
        .orderBy("o_year")
    )


# --- q78: TPC-H Q9 analog (product-type profit measure) ------------------------
@query(
    "q78_tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {sql_qint(
               sql_dsum(
                   "l_extendedprice * (1 - l_discount)"
                   " - p_retailprice * l_quantity * 0.1"
               ), 2
           )} AS profit_e2
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%ring%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q78_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (product-type profit): profit on every 'ring'
    part by supplier nation and order year.  The fixture has no
    partsupp table, so Q9's ps_supplycost is stood in by a 10%-of-
    retail unit cost (p_retailprice * l_quantity * 0.1) — same signed-
    amount aggregation shape, documented analog.

    Profit is SIGNED, so the sum rides the decimal path (dsum: per-row
    e6 quantize via decimal cast, exact decimal sum — dsum_pos's
    nonnegative fast path does not apply).  Plan: part (LIKE-filtered)
    and supplier-nation broadcast; lineitem joins orders on the
    clustered key — one wide shuffle, then a partial aggregate over
    nation x year."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%ring%"))
    nation = load(spark, sf_dir, "nation")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(qint(dsum(amount), 2).alias("profit_e2"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --- q79: TPC-H Q13 analog (customer order-count distribution) -----------------
@query(
    "q79_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q79_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog (customer distribution): histogram of customers
    by how many non-urgent orders they placed — the canonical left-
    outer-join-then-double-aggregate, where customers with ZERO
    matching orders must survive into the c_count=0 bucket (the whole
    reason it is an outer join).

    Plan: the priority filter prunes orders BEFORE the join (a filter
    inside the outer join's right side, not a post-join residual that
    would wrongly null out matches), the per-customer count shuffles
    once on the join key, and the second aggregate moves <=a-few-dozen
    (c_count, 1) pairs — map-side combinable to nothing."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )
