"""Set operations (SURVEY.md §2B q35-q36).

The reference's multi-platform fan-out merge (reference main.py:203-219:
per-platform collectors appended into one store) is a UNION ALL with a
source tag — generalized here, plus INTERSECT/EXCEPT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


@query(
    "q35_union",
    oracle="""
    SELECT nationkey, kind, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    ) GROUP BY 1, 2
    """,
)
def q35_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s).groupBy("nationkey", "kind").agg(F.count("*").alias("n"))


@query(
    "q36_setops",
    oracle="""
    SELECT nationkey, 'both' AS tag FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT nationkey, 'customer_only' AS tag FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier)
    """,
)
def q36_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).select("nationkey", F.lit("both").alias("tag"))
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicity).
    only_c = c.subtract(s).select("nationkey", F.lit("customer_only").alias("tag"))
    return both.unionByName(only_c)


# --- q36b: multiset set ops (INTERSECT ALL / EXCEPT ALL) -----------------------
# The ALL variants keep multiplicity (bag semantics): intersectAll
# yields min(m_left, m_right) copies per value, exceptAll
# max(m_left - m_right, 0) — distinct semantics from q36's
# set-DISTINCT forms and a separate physical strategy (no dedup agg).
@query(
    "q36b_setops_all",
    oracle="""
    SELECT nationkey, tag, COUNT(*) AS n FROM (
      SELECT nationkey, 'inter_all' AS tag FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier)
      UNION ALL
      SELECT nationkey, 'except_all' AS tag FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier)
    ) GROUP BY 1, 2
    """,
)
def q36b_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    inter = c.intersectAll(s).select("nationkey", F.lit("inter_all").alias("tag"))
    exc = c.exceptAll(s).select("nationkey", F.lit("except_all").alias("tag"))
    return (
        inter.unionByName(exc)
        .groupBy("nationkey", "tag")
        .agg(F.count("*").alias("n"))
    )
