"""Scalar function families (SURVEY.md §2B q37-q43): string, date/time,
math, array/higher-order, map, JSON, struct access.

These are the Athena-parity scalar surface the reference delegates
(reference main.py:4-5): e.g. its YYYY/MM/DD partition-key derivation
(main.py:70-73), `strftime` filename (main.py:177), ISO-8601 parse
(main.py:138), and hashtag-array handling (`entities.hashtags`,
main.py:90) all live in these families.  Everything is a built-in
pyspark.sql.functions call — JVM-side, whole-stage-codegen'd; no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.functions.num import qint
from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


# --- q37: string family ------------------------------------------------------
@query(
    "q37_string",
    oracle="""
    SELECT doc_id,
           upper(substring(text, 1, 10)) AS head10,
           length(text) AS text_len,
           length(trim(concat('  ', lang, '  '))) AS lang_len,
           concat(lang, '/', source) AS lang_source,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           strpos(text, 'spark') AS spark_pos,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text, ' ', '_', 'g') AS snake,
           replace(source, 'src', 'source-') AS source_long
    FROM documents
    WHERE doc_id < 100
    """,
)
def q37_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.length("text").cast("long").alias("text_len"),
        F.length(F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))))
        .cast("long")
        .alias("lang_len"),
        F.concat_ws("/", "lang", "source").alias("lang_source"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.instr(F.col("text"), "spark").cast("long").alias("spark_pos"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", " ", "_").alias("snake"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source-")).alias("source_long"),
    )


# --- q38: date/time family (partition-key derivation, main.py:70-73, 177) ---
@query(
    "q38_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           strftime(o_orderdate, '%Y/%m/%d') AS partition_key,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate - INTERVAL 7 DAY AS DATE) AS week_before,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch0,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def q38_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.quarter(od).alias("q"),
        F.date_format(od, "yyyy/MM/dd").alias("partition_key"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.date_sub(od.cast("date"), 7).alias("week_before"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch0"),
        F.unix_timestamp(od).alias("unix_ts"),
    )


# --- q39: math family --------------------------------------------------------
@query(
    "q39_math",
    oracle="""
    SELECT p_partkey,
           CAST(floor(p_retailprice * 1e1 + 0.5) AS BIGINT) AS price_e1,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_size - 25) AS size_dist,
           CAST(floor(sqrt(p_retailprice) * 1e6 + 0.5) AS BIGINT) AS price_sqrt_e6,
           CAST(floor(ln(p_retailprice + 1) * 1e6 + 0.5) AS BIGINT) AS price_ln_e6,
           CAST(floor(pow(p_size, 2) * 1e6 + 0.5) AS BIGINT) AS size_sq_e6,
           ((p_size % 7) + 7) % 7 AS size_mod7,
           CAST(greatest(p_size, 25) AS INT) AS size_hi,
           least(CAST(p_size AS DOUBLE), p_retailprice / 100) AS size_lo
    FROM part
    """,
)
def q39_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        qint(price, 1).alias("price_e1"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(size - 25).alias("size_dist"),
        qint(F.sqrt(price)).alias("price_sqrt_e6"),
        qint(F.log(price + 1)).alias("price_ln_e6"),
        qint(F.pow(size, 2)).alias("size_sq_e6"),
        F.pmod(size, F.lit(7)).alias("size_mod7"),
        F.greatest(size, F.lit(25)).alias("size_hi"),
        F.least(size.cast("double"), price / 100).alias("size_lo"),
    )


# --- q41: array / higher-order functions (entities.hashtags handling) --------
@query(
    "q41_array",
    oracle="""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT)
             AS total_chars,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
           CAST(list_contains(toks, 'spark') AS BOOLEAN) AS has_spark
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 200)
    """,
)
def q41_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    d = d.select("doc_id", F.split("text", " ").alias("toks"))
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.array_join(F.slice(F.sort_array(F.array_distinct("toks")), 1, 3), ",").alias(
            "first3_sorted"
        ),
        F.array_contains("toks", "spark").alias("has_spark"),
    )


# --- q42: map functions -------------------------------------------------------
@query(
    "q42_map",
    oracle="""
    SELECT event_id,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS uid_val,
           'type,uid' AS key_list,
           'type=' || event_type || ',uid=' || CAST(user_id AS VARCHAR) AS kv_pairs
    FROM events
    WHERE event_id < 500
    """,
)
def q42_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "uid").alias("uid_val"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("key_list"),
        F.array_join(
            F.transform(
                F.sort_array(F.map_entries(m)),
                lambda e: F.concat_ws("=", e.key, e.value),
            ),
            ",",
        ).alias("kv_pairs"),
    )


# --- q43: JSON functions (raw tweet / events.props string) --------------------
@query(
    "q43_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def q43_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        F.when(k_str.cast("long") >= 50, "high").otherwise("low").alias("k_band"),
    )


# --- q43b: VARIANT semi-structured path (Spark 4) ------------------------------
# Spark 4's VARIANT type is the modern semi-structured path: parse once
# into a binary-encoded variant, then typed variant_get extractions —
# no per-access JSON re-parse (the Athena/ion analogue of q43's
# get_json_object).  The variant itself never reaches the output (it is
# a complex type); only typed scalars do.
@query(
    "q43b_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    """,
)
def q43b_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_mod"),
    )
