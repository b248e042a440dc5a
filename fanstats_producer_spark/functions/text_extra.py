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


# --- x77: Zipf-law fit (corpus-statistics health check) -------------------------
#
# The standard corpus diagnostic: token frequencies should follow
# freq ∝ rank^(-s) with s ≈ 1; a log-log least-squares slope far from
# -1 flags synthetic, templated, or collapsed-vocabulary data before it
# trains anything.  Cross-engine determinism is the whole game for a
# regression over ln(): each ln value is QUANTIZED to an e6 integer
# first (floor(ln(v)*1e6 + 0.5) — a 1-ulp libm disagreement moves the
# pre-quantized value by ~1e-9 of the quantization step, so both
# engines land the same integer), and every regression sum then runs
# in exact BIGINT arithmetic (max |Σ x_q·y_q| ≈ 1.2e16 at this vocab,
# 9.2e18 headroom), leaving ONE identical double division at the end.
@query(
    "x77_zipf_fit",
    oracle="""
    WITH tf AS (
      SELECT tok, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok),
    ranked AS (
      SELECT CAST(floor(ln(ROW_NUMBER() OVER (ORDER BY freq DESC, tok))
                        * 1e6 + 0.5) AS BIGINT) AS xq,
             CAST(floor(ln(freq) * 1e6 + 0.5) AS BIGINT) AS yq
      FROM tf),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
             CAST(SUM(xq * yq) AS BIGINT) AS sxy,
             CAST(SUM(xq * xq) AS BIGINT) AS sxx
      FROM ranked)
    SELECT n AS n_types,
           CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5)
                AS BIGINT) AS slope_e6
    FROM s
    """,
)
def x77_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x77: log-log Zipf slope of the corpus token-frequency
    distribution (see block comment for the integer-exact regression
    contract).  Plan: one token explode + frequency aggregate (the
    single wide shuffle — same shape as x28's vocab build), then the
    rank window and all five regression sums run over a vocab-sized
    frame (|V| rows, KBs at any corpus scale: vocabulary grows
    sub-linearly by Heaps' law), so the fit itself is effectively
    free at 100 TB."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), "tok")
    ranked = tf.select(
        F.floor(F.log(F.row_number().over(w).cast("double")) * 1e6 + 0.5)
        .cast("long")
        .alias("xq"),
        F.floor(F.log(F.col("freq").cast("double")) * 1e6 + 0.5)
        .cast("long")
        .alias("yq"),
    )
    s = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        F.col("n").alias("n_types"),
        F.floor(num / den * 1e6 + 0.5).cast("long").alias("slope_e6"),
    )


# --- x85: l-diversity release audit ----------------------------------------------
# k-anonymity (x69) bounds group SIZE; it does not stop attribute
# disclosure — a group of 50 people who all share one sensitive value
# still leaks that value for every member.  l-diversity additionally
# requires each quasi-identifier group to contain at least l DISTINCT
# sensitive values (Machanavajjhala et al. 2007, public).  Sensitive
# attribute here: the account-balance sign/band (a stand-in for any
# sensitive column); same plan shape as x69 — broadcast dim, ONE
# aggregation with a distinct count inside, output bounded by the QI
# domain.  A release pipeline generalizes or suppresses groups failing
# EITHER gate, so the two keys together are the audit pair.
_X85_L = 3


@query(
    "x85_l_diversity",
    oracle=f"""
    WITH base AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             CASE WHEN c.c_acctbal < 0 THEN 'neg'
                  WHEN c.c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END AS sens
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
    grp AS (
      SELECT nation, segment, COUNT(*) AS group_size,
             COUNT(DISTINCT sens) AS l_distinct
      FROM base GROUP BY 1, 2)
    SELECT nation, segment, group_size, l_distinct,
           CAST(l_distinct < {_X85_L} AS INT) AS violates_l
    FROM grp
    """,
)
def x85_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fanstats_producer_spark.io import load

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    sens = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        sens.alias("sens"),
    )
    grp = base.groupBy("nation", "segment").agg(
        F.count("*").alias("group_size"),
        F.countDistinct("sens").alias("l_distinct"),
    )
    return grp.select(
        "nation",
        "segment",
        "group_size",
        "l_distinct",
        (F.col("l_distinct") < _X85_L).cast("int").alias("violates_l"),
    )


# --- x101: multi-keyword dictionary tagging (Aho-Corasick scale path) -----------
# The dictionary-scan primitive behind PII term audits, taxonomy/topic
# tagging, and blocklist filtering at corpus scale.  The naive plan —
# one substring probe per (doc, term) — is O(chars · |dict|) and dies
# when real dictionaries hit 1e4-1e6 terms; the production answer is
# Aho-Corasick (1975, public): compile the dictionary into a trie with
# failure links ONCE, then ONE pass over each document's characters
# finds every occurrence of every term, overlapping and nested
# included — O(chars + matches), independent of dictionary size.
#
# Here the automaton compiles per mapInPandas batch (milliseconds for
# any sane dict; at 1e6 terms broadcast the pickled automaton instead)
# and the scan is the only per-char work.  The ORACLE deliberately IS
# the naive plan (list_filter over every start position), so the
# comparison proves the single-pass automaton finds exactly the
# all-start-positions match set.  Semantics: n_hits = number of
# character start positions where the term occurs (overlapping counts:
# 'aaaa' has 3 hits of 'aa'); terms are matched raw (no word
# boundaries), char-level positions (both sides index characters, not
# bytes).  Only (doc, term) pairs with >= 1 hit are emitted.
_X101_TERMS = [
    "spark",
    "scan",
    "row scan",
    "hash agg",
    "sort merge",
    "table",
]


def _aho_build(terms):
    """goto/fail/output automaton over the term list."""
    goto = [{}]
    out = [[]]
    for t in terms:
        s = 0
        for ch in t:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(t)
    from collections import deque

    fail = [0] * len(goto)
    dq = deque()
    for ch, s in goto[0].items():
        dq.append(s)
    while dq:
        r = dq.popleft()
        for ch, s in goto[r].items():
            dq.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            # f walks the fail chain of r, so it is strictly shallower
            # than r and goto[f][ch] can never be s itself (each trie
            # node has exactly one parent) — the plain assignment is
            # the standard fail link, no self-loop guard needed.
            fail[s] = goto[f].get(ch, 0)
            out[s] = out[s] + out[fail[s]]
    return goto, fail, out


def aho_scan(text: str, automaton) -> dict:
    """term -> number of start positions where term matches (one pass)."""
    goto, fail, out = automaton
    counts: dict = {}
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for t in out[s]:
            counts[t] = counts.get(t, 0) + 1
    return counts


def keyword_tags(docs: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, term, n_hits): every dictionary term's overlapping
    occurrence count per document, via one Aho-Corasick pass."""
    terms = list(terms)

    def scan(batches):
        automaton = _aho_build(terms)
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for t, n in aho_scan(text or "", automaton).items():
                    rows.append((doc_id, t, n))
            yield pd.DataFrame(
                rows, columns=["doc_id", "term", "n_hits"]
            ).astype({"doc_id": "int64", "n_hits": "int64"})

    return docs.select("doc_id", "text").mapInPandas(
        scan, "doc_id long, term string, n_hits long"
    )


X101_ORACLE = f"""
    WITH terms AS (
      SELECT unnest({_X101_TERMS!r}) AS term),
    hits AS (
      SELECT d.doc_id, t.term,
             len(list_filter(range(1, len(d.text) - len(t.term) + 2),
                 p -> substr(d.text, p, len(t.term)) = t.term))
               AS n_hits
      FROM documents d CROSS JOIN terms t)
    SELECT doc_id, term, CAST(n_hits AS BIGINT) AS n_hits
    FROM hits WHERE n_hits > 0
    """


@query("x101_keyword_tags", oracle=X101_ORACLE)
def x101_keyword_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x101: dictionary term tagging over the corpus — the automaton's
    one-pass match counts checked against the oracle's exhaustive
    every-start-position probe."""
    from fanstats_producer_spark.io import spread

    return keyword_tags(
        spread(load(spark, sf_dir, "documents"), "doc_id"), _X101_TERMS
    )
