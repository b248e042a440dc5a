"""Additional text-pipeline operators: pandas UDAF, PII redaction,
n-gram extraction.

u05 completes the UDF/UDAF/UDTF surface (SURVEY.md §2B) with a grouped-
aggregate pandas UDF.  x12/x13 are standard LLM-training-data transforms:
redaction runs as pure JVM regexp_replace (codegen'd — the shape a
100 TB pass must have), n-grams reuse the dedup module's vectorized
shingle kernel.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from fanstats_producer_spark.io import load
from fanstats_producer_spark.operators.dedup import with_shingles
from fanstats_producer_spark.registry import query


# --- u05: grouped-aggregate pandas UDF (UDAF) ----------------------------------
@F.pandas_udf(LongType())
def _gini_udaf(v: pd.Series) -> int:
    """Gini mean difference (e6-quantized) — an aggregate not in either
    engine's built-ins, so the oracle recomputes it from first
    principles.  The weighted terms are integer-valued doubles (acctbal
    has 2 decimals; weights are ints), so the sum is EXACT under any
    summation order — numpy's pairwise sum and DuckDB's sequential SUM
    agree bit-for-bit, and the floor-quantized output is deterministic."""
    import math

    import numpy as np

    x = np.sort(v.to_numpy(dtype="float64"))
    n = len(x)
    if n < 2:
        return 0
    weights = 2 * np.arange(1, n + 1) - n - 1
    return int(math.floor((weights * x).sum() / (n * (n - 1)) * 1e6 + 0.5))


@query(
    "u05_pandas_udaf",
    oracle="""
    SELECT c_mktsegment,
           CAST(floor(SUM((2.0 * rn - n - 1) * c_acctbal) / (n * (n - 1))
                      * 1e6 + 0.5) AS BIGINT) AS gini_md_e6
    FROM (SELECT c_mktsegment, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS rn,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM customer)
    GROUP BY c_mktsegment, n
    """,
)
def u05_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(_gini_udaf("c_acctbal").alias("gini_md_e6"))
    )


# --- x12: PII redaction -----------------------------------------------------------
_EMAIL_RE = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


def redact(df: DataFrame, col: str) -> DataFrame:
    """Mask email/phone patterns — pure regexp_replace, JVM-side."""
    out = F.regexp_replace(F.col(col), _EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, _PHONE_RE, "<PHONE>")
    return df.withColumn(f"{col}_redacted", out)


@query(
    "x12_redact",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(synth, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS synth_redacted
    FROM (SELECT doc_id,
                 source || '@example.com wrote: ' || text
                   || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS synth
          FROM documents)
    """,
)
def x12_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture corpus carries no PII, so the query plants a synthetic
    email+phone per row and asserts the masking transform end-to-end."""
    d = load(spark, sf_dir, "documents").withColumn(
        "synth",
        F.concat(
            F.col("source"),
            F.lit("@example.com wrote: "),
            F.col("text"),
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    return redact(d, "synth").select("doc_id", "synth_redacted")


# --- x13: n-gram extraction ---------------------------------------------------------
@query(
    "x13_ngrams",
    oracle="""
    SELECT lang, bigram, n, CAST(rn AS INT) AS rn FROM (
      SELECT lang, bigram, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
      FROM (SELECT lang, bigram, COUNT(*) AS n
            FROM (SELECT lang, unnest(list_transform(
                           range(1, greatest(len(toks), 1)),
                           i -> toks[i] || ' ' || toks[i+1])) AS bigram
                  FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents))
            GROUP BY 1, 2))
    WHERE rn <= 5
    """,
)
def x13_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 token bigrams per language (non-distinct shingles: frequency
    analysis wants multiplicity, unlike dedup)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.zip_with(
        toks, F.slice(toks, 2, F.size(toks)), lambda x, y: F.concat_ws(" ", x, y)
    )
    bigrams = F.slice(bigrams, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    counts = (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "bigram")
    return counts.select("lang", "bigram", "n", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 5
    )


# --- x69: k-anonymity release audit ----------------------------------------------
# The privacy gate next to x12's PII redaction: before a data release,
# every quasi-identifier combination must describe at least k
# individuals, or those rows re-identify people by join.  One
# aggregation over the quasi-identifier tuple; the audit output is a
# per-group row (bounded by the QI domain, not the table), plus each
# group's violation flag — the release pipeline drops or generalizes
# the flagged groups.

_X69_K = 5


@query(
    "x69_k_anonymity",
    oracle=f"""
    WITH grp AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             COUNT(*) AS group_size
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2)
    SELECT nation, segment, group_size,
           CAST(group_size < {_X69_K} AS INT) AS violates_k
    FROM grp
    """,
)
def x69_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x69: k-anonymity audit over the (nation, segment) quasi-
    identifier — group sizes below k={_k} flag re-identification risk.
    Plan: the dimension broadcasts onto the customer scan and the
    single aggregation is map-side combinable; output is one row per
    occupied QI cell, so the audit result stays tiny no matter how
    large the table grows."""
    from fanstats_producer_spark.io import load

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    grp = (
        c.join(
            F.broadcast(n), c.c_nationkey == n.n_nationkey
        )
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("group_size"))
    )
    return grp.select(
        "nation",
        "segment",
        "group_size",
        (F.col("group_size") < _X69_K).cast("int").alias("violates_k"),
    )


x69_k_anonymity.__doc__ = x69_k_anonymity.__doc__.format(_k=_X69_K)
