"""Subqueries, CTEs, and the SQL entry path (Athena-parity surface the
reference delegates wholesale, reference main.py:4-5).

q17 exercises scalar + correlated subqueries through the DataFrame API
(expressed as joins — which is exactly how Catalyst rewrites them);
q18 goes through spark.sql() with temp views and a CTE, proving the SQL
front door produces the same plans as the DataFrame chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.functions.num import dsum, sql_dsum
from fanstats_producer_spark.io import load, register_views
from fanstats_producer_spark.registry import query


# --- q17: scalar + correlated subqueries -------------------------------------
@query(
    "q17_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
    """,
)
def q17_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    # scalar subquery → cross-joined 1-row aggregate (Catalyst's rewrite)
    avg_price = o.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > 1.8 * F.col("__avg"))
        .join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
    )


# --- q18: CTE through the SQL front door --------------------------------------
@query(
    "q18_sql_cte",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {rev} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate < TIMESTAMP '2000-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """.format(rev=sql_dsum("l_extendedprice * (1 - l_discount)")),
)
def q18_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarter revenue) via spark.sql."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(SUM(CAST((l_extendedprice * (1 - l_discount))
                               AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '2000-01-01'
            AND l_shipdate < TIMESTAMP '2000-04-01'
          GROUP BY 1)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


# --- q27: pivot ------------------------------------------------------------------
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "q27_pivot",
    oracle="""
    SELECT n.n_name,
           {cols}
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """.format(
        cols=",\n           ".join(
            f"CAST(SUM(CASE WHEN c.c_mktsegment = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS {s.lower()}"
            for s in _SEGMENTS
        )
    ),
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    piv = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", _SEGMENTS)  # explicit values: no extra scan
        .count()
    )
    # pivot yields nulls for absent combos; oracle's SUM(CASE) yields 0
    return piv.select(
        "n_name",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS],
    )


# --- q53: recursive CTE (calendar densification) --------------------------------
# Spark 4.1 executes WITH RECURSIVE natively (UNION ALL form — the
# semi-naive UNION-dedup form is not supported yet, so recursion must be
# structurally acyclic; transitive closure over cyclic near-dup graphs
# stays with x04e's pointer-jumping loop).  The canonical acyclic use is
# sequence generation: densify a sparse daily time series so zero-order
# days appear — the gap-filling step every calendar rollup needs before
# window arithmetic over "consecutive" days.
_Q53_START, _Q53_END = "1995-03-01", "1995-03-31"


@query(
    "q53_recursive_cte",
    oracle=f"""
    WITH RECURSIVE cal(day) AS (
      SELECT DATE '{_Q53_START}'
      UNION ALL
      SELECT day + 1 FROM cal WHERE day < DATE '{_Q53_END}')
    SELECT cal.day, COUNT(o_orderkey) AS n_orders
    FROM cal LEFT JOIN orders ON o_orderdate = cal.day
    GROUP BY 1
    """,
)
def q53_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """March 1995 calendar generated by recursion, left-joined to orders:
    every day appears, including days with zero orders."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__q53_orders")
    return spark.sql(f"""
      WITH RECURSIVE cal(day) AS (
        SELECT DATE '{_Q53_START}'
        UNION ALL
        SELECT date_add(day, 1) FROM cal WHERE day < DATE '{_Q53_END}')
      SELECT cal.day, COUNT(o_orderkey) AS n_orders
      FROM cal LEFT JOIN __q53_orders ON o_orderdate = cal.day
      GROUP BY 1
    """)


# --- q27b: unpivot (inverse of q27) ----------------------------------------------
@query(
    "q27b_unpivot",
    oracle="""
    WITH agg AS (
      SELECT o_orderstatus,
             {sums}
      FROM orders GROUP BY 1)
    SELECT o_orderstatus, metric, val
    FROM agg
    UNPIVOT (val FOR metric IN (n_low AS 'n_low', n_med AS 'n_med', n_high AS 'n_high'))
    """.format(
        sums=""",
             """.join(
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"
            for name, cond in [
                ("n_low", "o_totalprice < 100000"),
                ("n_med", "o_totalprice >= 100000 AND o_totalprice < 200000"),
                ("n_high", "o_totalprice >= 200000"),
            ]
        )
    ),
)
def q27b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide price-band counts melted back to long form with unpivot —
    the wide->long half of reshaping (q27 is long->wide)."""
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    wide = o.groupBy("o_orderstatus").agg(
        F.sum(F.when(price < 100000, 1).otherwise(0)).alias("n_low"),
        F.sum(
            F.when((price >= 100000) & (price < 200000), 1).otherwise(0)
        ).alias("n_med"),
        F.sum(F.when(price >= 200000, 1).otherwise(0)).alias("n_high"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_low", "n_med", "n_high"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# --- q68: LATERAL correlated derived table --------------------------------------
@query(
    "q68_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
    WHERE c.c_custkey < 50
    """,
)
def q68_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table (SQL:99 lateral join, supported
    natively since Spark 3.2): per customer, the top-3 orders by price
    — the row-generating correlated-subquery shape that LATERAL VIEW
    (explode) cannot express.  Catalyst rewrites the correlation into a
    join + per-key limit; the DuckDB oracle runs the IDENTICAL SQL, so
    the surface itself (not a hand-rewritten equivalent) is what's
    checked.  Output keeps raw parquet doubles (bit-identical on both
    engines); ordering ties break on o_orderkey so the LIMIT is
    deterministic."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        WHERE c.c_custkey < 50
        """
    )


# --- q69: null-safe equality join ----------------------------------------------
@query(
    "q69_nullsafe_join",
    oracle="""
    WITH a AS (SELECT NULLIF(l_returnflag, 'N') AS k, COUNT(*) AS n_a
               FROM lineitem GROUP BY 1),
         b AS (SELECT NULLIF(l_returnflag, 'N') AS k,
                      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_b
               FROM lineitem GROUP BY 1)
    SELECT a.k, a.n_a, b.qty_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q69_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — its own join semantics (a
    plain equi-join silently drops the NULL group; the null-safe
    operator keeps it hash-joinable, which is exactly how Spark plans
    EqualNullSafe keys).  Keys are manufactured with NULLIF so the
    fixture actually exercises the NULL row."""
    li = load(spark, sf_dir, "lineitem")
    k = F.nullif(F.col("l_returnflag"), F.lit("N")).alias("k")
    a = li.select(k).groupBy("k").agg(F.count("*").alias("n_a"))
    b = (
        li.select(k, "l_quantity")
        .groupBy("k")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_b"))
    )
    return a.join(b, a.k.eqNullSafe(b.k)).select(a.k, "n_a", "qty_b")
