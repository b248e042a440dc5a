"""Multimodal columns (SURVEY.md §2C T7): binary payloads with typed
metadata, carried through the relational pipeline, processed via
Arrow-batched mapInPandas.

Design: image/audio/video are opaque `binary` columns plus a metadata
struct (format, n_bytes, ...).  Decode / feature-extraction runs inside
mapInPandas so each Arrow batch of blobs is handled by one Python worker
pass — the same shape a real CV/audio stage would use.  The actual codec
call is stubbed (no media libs in this container): `decode_image` raises
NotImplementedError and the pipeline substitutes a deterministic fake
feature set, keeping the Spark-side plumbing (schema, batching,
partitioning) fully real and testable.

The fixture has no binary column, so x07 manufactures payloads from
`documents.text` (UTF-8 bytes) — byte-identical on both engines, which
makes the whole binary path oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


def decode_image(payload: bytes) -> object:
    """Real codec goes here (PIL/libvips). Not available in this
    container — callers must catch and use deterministic fallbacks."""
    raise NotImplementedError("image codecs not available in this environment")


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-blob features. Tries the real decoder,
    falls back to deterministic byte-level features (size, digest,
    leading byte) so the batch shape and schema stay production-real."""
    for pdf in batches:
        payloads = pdf["payload"]
        feats = []
        for doc_id, blob in zip(pdf["doc_id"], payloads):
            b = bytes(blob)
            try:
                decode_image(b)  # pragma: no cover - always raises here
                raise AssertionError("unreachable in this container")
            except NotImplementedError:
                feats.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": len(b),
                        "payload_sha": hashlib.sha256(b).hexdigest(),
                        "head_byte": b[0] if b else None,
                    }
                )
        yield pd.DataFrame(feats)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload + metadata struct (T7 column model)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("utf8-blob").alias("format"),
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


@query(
    "x07_multimodal",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha,
           ascii(substring(text, 1, 1)) AS head_byte
    FROM documents
    """,
)
def x07_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = with_payload(load(spark, sf_dir, "documents"))
    return payloads.mapInPandas(
        extract_features,
        schema="doc_id long, n_bytes long, payload_sha string, head_byte int",
    )
