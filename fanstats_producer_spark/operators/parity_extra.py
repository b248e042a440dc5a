"""Additional Athena/ANSI parity operators (SURVEY.md §2B long tail):
argmin/argmax aggregates, positional explode, safe casting, interval
arithmetic, and map higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.io import load, register_views
from fanstats_producer_spark.registry import query


# --- q29: min_by / max_by (argmin/argmax) -------------------------------------
@query(
    "q29_minmaxby",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
      FROM orders)
    SELECT o_custkey,
           MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
           MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM ranked
    GROUP BY 1
    """,
)
def q29_minmaxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ties broken by (price, orderkey) struct ordering — deterministic on
    # both engines (DuckDB arg_max by ROW(...), Spark max_by by struct).
    o = load(spark, sf_dir, "orders")
    key = F.struct("o_totalprice", "o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "biggest_order"
        ),
        F.expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "smallest_order"
        ),
        F.max("o_totalprice").alias("max_price"),
    )


# --- q41b: positional explode (UNNEST WITH ORDINALITY) -------------------------
@query(
    "q41b_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) AS INT) AS pos,
           unnest(toks) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 30)
    """,
)
def q41b_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).withColumn("pos", F.col("pos") + 1)  # 1-based like SQL ordinality


# --- q45: safe casting (try_cast) ----------------------------------------------
@query(
    "q45_trycast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(maybe_num AS BIGINT) AS as_num,
           TRY_CAST(lang AS BIGINT) AS lang_num,
           COALESCE(TRY_CAST(maybe_num AS BIGINT), -1) AS with_default
    FROM (SELECT doc_id, lang,
                 CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                      ELSE 'not-a-number' END AS maybe_num
          FROM documents)
    """,
)
def q45_trycast(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").withColumn(
        "maybe_num",
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string")).otherwise(
            F.lit("not-a-number")
        ),
    )
    as_num = F.col("maybe_num").try_cast("bigint")
    return d.select(
        "doc_id",
        as_num.alias("as_num"),
        F.col("lang").try_cast("bigint").alias("lang_num"),
        F.coalesce(as_num, F.lit(-1)).alias("with_default"),
    )


# --- q46: interval arithmetic ---------------------------------------------------
@query(
    "q46_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(o_orderdate - INTERVAL 45 DAY AS DATE) AS minus_45d,
           ROUND(12 * (year(age(TIMESTAMP '2002-01-01', o_orderdate))
                 ) + month(age(TIMESTAMP '2002-01-01', o_orderdate)), 0)
             AS whole_months_to_2002,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start
    FROM orders WHERE o_orderkey < 500
    """,
)
def q46_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(od.cast("date"), 3).alias("plus_3m"),
        F.date_sub(od.cast("date"), 45).alias("minus_45d"),
        # whole months between (floor), mirrored by DuckDB age() parts
        F.floor(F.months_between(F.lit("2002-01-01").cast("timestamp"), od))
        .cast("double")
        .alias("whole_months_to_2002"),
        F.date_trunc("week", od).cast("date").alias("week_start"),
    )


# --- q42b: map higher-order functions -------------------------------------------
@query(
    "q42b_map_hof",
    oracle="""
    SELECT event_id,
           k_sq,
           CAST(n_keys AS INT) AS n_keys
    FROM (SELECT event_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   * CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_sq,
                 1 AS n_keys
          FROM events WHERE event_id < 300)
    """,
)
def q42b_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_values / map_filter / map_entries over a map parsed from
    the props JSON (map<string,bigint>); the oracle mirrors the scalar
    outcome (DuckDB's MAP type round-trips poorly through comparison, so
    the asserted values are extracted scalars)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    m = F.from_json("props", "map<string,bigint>")
    squared = F.transform_values(m, lambda k, v: v * v)
    kept = F.map_filter(squared, lambda k, v: k == F.lit("k"))
    return ev.select(
        "event_id",
        F.element_at(kept, "k").alias("k_sq"),
        F.size(F.map_entries(kept)).alias("n_keys"),
    )


# --- q47: null-safe equality join ------------------------------------------------
@query(
    "q47_nullsafe_join",
    oracle="""
    WITH a AS (SELECT doc_id, NULLIF(lang, 'zh') AS lang_n FROM documents),
         b AS (SELECT NULLIF(lang, 'zh') AS lang_n, COUNT(*) AS lang_total
               FROM documents GROUP BY 1)
    SELECT a.doc_id, COALESCE(a.lang_n, '<null>') AS lang_key, b.lang_total
    FROM a JOIN b ON a.lang_n IS NOT DISTINCT FROM b.lang_n
    """,
)
def q47_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<=> (eqNullSafe): null keys join to null keys — the semantics a
    plain equi-join silently drops."""
    d = load(spark, sf_dir, "documents").withColumn(
        "lang_n", F.nullif(F.col("lang"), F.lit("zh"))
    )
    totals = (
        d.groupBy("lang_n")
        .agg(F.count("*").alias("lang_total"))
        .withColumnRenamed("lang_n", "lang_n_t")
    )
    a = d.select("doc_id", "lang_n")
    return (
        a.join(totals, F.col("lang_n").eqNullSafe(F.col("lang_n_t")))
        .select(
            "doc_id",
            F.coalesce("lang_n", F.lit("<null>")).alias("lang_key"),
            "lang_total",
        )
    )


# --- q48: lateral correlated subquery --------------------------------------------
@query(
    "q48_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) t
    """,
)
def q48_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery through the SQL front door (top-2
    orders per customer); Catalyst rewrites it to the same windowed plan
    as q33."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t
        """
    )
