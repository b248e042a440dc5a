"""Document chunking and sequence packing — the two transforms that sit
between a cleaned corpus and a training dataloader.

- Chunking: split long documents into overlapping fixed-size token
  windows (context-window fitting with overlap so no span is lost at a
  boundary).  Pure array expressions: per-row transform over computed
  chunk starts, then explode — no Python, no shuffle.
- Packing: concatenate consecutive short documents into ~budget-sized
  groups ("concat-and-chop" packing).  Greedy running-token-count over
  a deterministic document order, group = floor(prior_cumsum / budget);
  one window pass + one shuffle for the group agg.  At 100 TB the
  window partitions by shard key (here: lang) so no global ordering is
  ever required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query

_CHUNK = 20
_STRIDE = 15  # overlap = _CHUNK - _STRIDE = 5 tokens


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = _CHUNK,
    stride: int = _STRIDE,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_chunk_tokens) — overlapping
    windows; the final partial window is kept (training wants the tail).
    ``passthrough`` names extra columns to carry onto every chunk row
    (e.g. the shard key for downstream packing)."""
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(chunk_size)) / F.lit(stride)) + 1, F.lit(1)
    ).cast("int")
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(toks, (s + 1).cast("int"), chunk_size), " "
            ).alias("chunk_text"),
            F.least(n - s, F.lit(chunk_size)).cast("int").alias("n_chunk_tokens"),
        ),
    )
    return docs.select(
        "doc_id", *passthrough, F.explode(chunks).alias("c")
    ).select("doc_id", *passthrough, "c.chunk_idx", "c.chunk_text", "c.n_chunk_tokens")


@query(
    "x17_chunking",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         n AS (SELECT doc_id, toks, len(toks) AS n_tok,
                      greatest(CAST(ceil((len(toks) - {_CHUNK}) / {_STRIDE}.0) AS INT) + 1, 1)
                        AS n_chunks
               FROM d)
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           array_to_string(toks[i * {_STRIDE} + 1 : i * {_STRIDE} + {_CHUNK}], ' ')
             AS chunk_text,
           CAST(least(n_tok - i * {_STRIDE}, {_CHUNK}) AS INT) AS n_chunk_tokens
    FROM n, LATERAL (SELECT unnest(range(0, n_chunks)) AS i)
    """,
)
def x17_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load(spark, sf_dir, "documents"))


_BUDGET = 256


def pack_documents(
    docs: DataFrame, budget: int = _BUDGET, shard_col: str = "lang"
) -> DataFrame:
    """Assign docs to ~budget-token packs: deterministic doc order per
    shard, pack = floor(tokens-before-this-doc / budget)."""
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy(shard_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    return docs.select(
        "doc_id",
        F.col(shard_col).alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
        F.floor(before / budget).cast("long").alias("pack_id"),
    )


@query(
    "x18_packing",
    oracle=f"""
    SELECT doc_id,
           lang AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(floor(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_BUDGET}) AS BIGINT) AS pack_id
    FROM documents
    """,
)
def x18_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_documents(load(spark, sf_dir, "documents"))
