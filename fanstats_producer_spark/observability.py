"""Pipeline observability: free-of-charge metrics on a running job.

The reference emits no metrics at all (src/main.py logs row counts to
stdout, main.py:158); a production ingest needs counters without paying
a second pass.  Spark's `observe` API attaches aggregate expressions to
a plan node: they are computed DURING the action (piggybacked on the
existing scan, zero extra jobs) and surface on the driver afterwards —
batch via `pyspark.sql.Observation`, streaming via each progress
event's `observedMetrics`.  This is the 100 TB-safe shape: no
`.count()` double-scan, no accumulator drift on task retries (observed
metrics are computed from the successful task set exactly once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def standard_metrics(df: DataFrame, *, text_col: str | None = None) -> list[Column]:
    """The default ingest counter set: row count, null-id count, and
    (for text payloads) empty-text count — the quality gauges the
    reference's stdout logging approximated."""
    first = df.columns[0]
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(first).isNull(), 1).otherwise(0)).alias(
            f"n_null_{first}"
        ),
    ]
    if text_col is not None:
        metrics.append(
            F.sum(
                F.when(F.length(F.col(text_col)) == 0, 1).otherwise(0)
            ).alias(f"n_empty_{text_col}")
        )
    return metrics


def with_observation(
    df: DataFrame, name: str, metrics: list[Column] | None = None,
    text_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Batch arm: attach metrics, return (df, observation).  After any
    action on the returned frame, ``observation.get`` holds the values."""
    obs = Observation(name)
    m = metrics if metrics is not None else standard_metrics(df, text_col=text_col)
    return df.observe(obs, *m), obs


def with_stream_metrics(
    df: DataFrame, name: str, metrics: list[Column] | None = None,
    text_col: str | None = None,
) -> DataFrame:
    """Streaming arm: same expressions, surfaced per micro-batch in
    ``query.lastProgress["observedMetrics"][name]`` (readable by any
    metrics shipper from the progress listener)."""
    m = metrics if metrics is not None else standard_metrics(df, text_col=text_col)
    return df.observe(name, *m)
