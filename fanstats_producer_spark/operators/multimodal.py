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
import math
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


def tensor_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker with REAL vectorized compute: each payload is
    viewed as a uint8 tensor (numpy zero-copy over the Arrow buffer),
    split into 8 contiguous segments (np.array_split boundaries), and
    mean-pooled per segment — the shape of a patch-embedding stage, with
    the codec decode swapped for the byte view.  Empty segments (payloads
    shorter than 8 bytes) emit no row, so the output is well-defined for
    any blob."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(blob), dtype=np.uint8)
            for seg, chunk in enumerate(np.array_split(arr, 8)):
                if chunk.size:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "seg": seg,
                            # exact: integer byte sum / count, then
                            # pure-IEEE floor quantization
                            "mean_byte_e6": int(
                                math.floor(
                                    float(chunk.sum())
                                    / chunk.size
                                    * 1e6
                                    + 0.5
                                )
                            ),
                        }
                    )
        yield pd.DataFrame(rows, columns=["doc_id", "seg", "mean_byte_e6"])


# The oracle reproduces np.array_split's boundaries (i*(l//8)+min(i,l%8))
# byte-for-byte over the UTF-8 blob, so the numpy pooling is value-hash
# checked — the decode stub is the only fake in the multimodal path.
@query(
    "x07b_tensor_features",
    oracle="""
    WITH t AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS l
      FROM documents),
    pos AS (
      SELECT doc_id, hx, l, unnest(range(l)) AS p FROM t),
    byts AS (
      -- np.array_split: (l%8) leading segments of size l//8+1, the rest
      -- of size l//8; closed-form inverse maps a byte position to its
      -- segment (the ELSE branch is unreachable when l//8 = 0).
      SELECT doc_id,
             CASE WHEN p < (l % 8) * (l // 8 + 1)
                  THEN p // (l // 8 + 1)
                  ELSE (l % 8) + (p - (l % 8) * (l // 8 + 1)) // (l // 8)
             END AS seg,
             CAST(('0x' || substring(hx, CAST(2 * p + 1 AS INT), 2)) AS INT) AS v
      FROM pos)
    SELECT doc_id, CAST(seg AS INT) AS seg,
           CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) AS BIGINT)
             AS mean_byte_e6
    FROM byts GROUP BY 1, 2
    """,
)
def x07b_tensor_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = with_payload(load(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return payloads.mapInPandas(
        tensor_features, schema="doc_id long, seg int, mean_byte_e6 long"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize goes here (PIL.Image.resize). Unavailable in this
    container — callers catch NotImplementedError and use the
    deterministic fake below."""
    raise NotImplementedError("image codecs not available in this environment")


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in with the right contract shape: output size
    scales with the requested dimensions, content derived from input."""
    target = max(1, (width * height) // 64)
    reps = (target // max(len(payload), 1)) + 1
    return (payload * reps)[:target]


def resize_batch(width: int, height: int):
    """mapInPandas stage: resize every blob in the batch. Arrow batch in,
    Arrow batch out — the exact shape of a production CV stage."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(blob)
                try:
                    resized = resize_image(b, width, height)
                except NotImplementedError:
                    resized = _fake_resize(b, width, height)
                out.append({"doc_id": int(doc_id), "payload": resized,
                            "width": width, "height": height})
            yield pd.DataFrame(out)

    return fn


def sample_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Real frame sampling goes here (pyav/ffmpeg). Unavailable —
    callers catch and use the deterministic byte-stride fake."""
    raise NotImplementedError("video codecs not available in this environment")


def _fake_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stride sampling over the byte stream: n_frames
    evenly spaced 16-byte windows (contract: list of frame blobs)."""
    if not payload:
        return []
    stride = max(len(payload) // n_frames, 1)
    return [payload[i * stride : i * stride + 16] for i in range(n_frames)]


def frame_sample_batch(n_frames: int):
    """mapInPandas stage: explode each video blob into frame rows."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(blob)
                try:
                    frames = sample_frames(b, n_frames)
                except NotImplementedError:
                    frames = _fake_frames(b, n_frames)
                for idx, frame in enumerate(frames):
                    rows.append({"doc_id": int(doc_id), "frame_idx": idx,
                                 "frame": frame})
            yield pd.DataFrame(rows)

    return fn


def read_binary_assets(
    spark: SparkSession,
    asset_dir: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest raw media files as a binary-column DataFrame via Spark's
    built-in `binaryFile` source — the on-disk half of the T7 column
    model (with_payload manufactures payloads from text; this reads
    real files: images, audio, video stills).

    Columns: (path, modificationTime, length, content binary).  At
    100 TB the wins are source-side: `pathGlobFilter` prunes by
    extension during listing, a `length` predicate is evaluated against
    file metadata (oversized media never reaches an executor), and
    `recursiveFileLookup` walks nested asset layouts without a manifest.
    Output feeds extract_features / mapInPandas unchanged.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(asset_dir)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df.select(
        F.col("path"),
        F.col("length").cast("long").alias("n_bytes"),
        F.col("content").alias("payload"),
        F.struct(
            F.element_at(F.split(F.col("path"), r"\."), -1).alias("format"),
            F.col("length").cast("long").alias("n_bytes"),
            F.col("modificationTime").alias("modified"),
        ).alias("meta"),
    )


# --- x42: video frame sampling (T7 temporal-media arm) --------------------------
# A video stage samples every S-th frame before feature extraction (the
# standard decode-cost lever).  The codec is stubbed like decode_image;
# the fallback treats the payload as fixed-size frame records (FB bytes
# per frame) — which keeps the frame arithmetic, the Arrow batch shape,
# and the sampled-bytes fingerprint fully real and byte-checkable in
# SQL (fixture text is ASCII, so char offsets == byte offsets).
_FRAME_BYTES = 32
_FRAME_STRIDE = 4


def decode_video(payload: bytes) -> object:
    """Real demuxer/codec goes here (ffmpeg/pyav). Not available in
    this container — callers must catch and use the fixed-size-frame
    fallback."""
    raise NotImplementedError("video codecs not available in this environment")


def x42_sample_worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-blob frame sampling.  Tries the real
    decoder, falls back to deterministic fixed-size frame slicing.
    (Named distinctly from the pre-existing sample_frames(payload,
    n_frames) codec stub used by frame_sample_batch.)"""
    for pdf in batches:
        out = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(blob)
            try:
                decode_video(b)  # pragma: no cover - always raises here
                raise AssertionError("unreachable in this container")
            except NotImplementedError:
                n_frames = max(1, math.ceil(len(b) / _FRAME_BYTES))
                picks = range(0, n_frames, _FRAME_STRIDE)
                sampled = b"".join(
                    b[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES] for i in picks
                )
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_frames": n_frames,
                        "n_sampled": len(list(picks)),
                        "sample_fp": hashlib.md5(sampled).hexdigest(),
                    }
                )
        yield pd.DataFrame(out)


@query(
    "x42_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(greatest(1, CAST(ceil(len(text) / {_FRAME_BYTES}.0) AS BIGINT))
             AS BIGINT) AS n_frames,
           CAST((greatest(1, CAST(ceil(len(text) / {_FRAME_BYTES}.0) AS BIGINT))
                 + {_FRAME_STRIDE - 1}) // {_FRAME_STRIDE} AS BIGINT) AS n_sampled,
           md5(array_to_string(list_transform(
                 range(0, CAST(greatest(1, CAST(ceil(len(text) / {_FRAME_BYTES}.0)
                                             AS BIGINT)) AS BIGINT), {_FRAME_STRIDE}),
                 i -> substr(text, CAST(i * {_FRAME_BYTES} + 1 AS BIGINT),
                             {_FRAME_BYTES})), '')) AS sample_fp
    FROM documents
    """,
)
def x42_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the manufactured video payloads: every
    {stride}th fixed-size frame, fingerprinted — the oracle re-derives
    frame boundaries and the sampled-bytes md5 from the same ASCII
    payloads.""".format(stride=_FRAME_STRIDE)
    from fanstats_producer_spark.io import spread

    payloads = with_payload(
        spread(load(spark, sf_dir, "documents"), "doc_id")
    ).select("doc_id", "payload")
    return payloads.mapInPandas(
        x42_sample_worker,
        schema="doc_id long, n_frames long, n_sampled long, sample_fp string",
    )
