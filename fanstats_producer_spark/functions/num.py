"""Cross-engine-deterministic numeric aggregation helpers.

Summing doubles is order-dependent, and Spark's partition-parallel sums
will never bitwise-match a single-threaded oracle.  The fix: quantize each
row to DECIMAL(18,6) (deterministic — it rounds the *same* IEEE double on
both engines), sum exactly in decimal, and cast the exact result back to
double.  Identical values on any engine, any partitioning, any row order —
which is exactly what a 1000-executor cluster needs for reproducible
aggregates too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a double column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """avg = exact-decimal sum / count, rounded — deterministic because
    both operands are bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(dsum(c) / F.count(c), scale)


def sql_dsum(expr: str) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB mirror of :func:`davg`."""
    return f"ROUND({sql_dsum(expr)} / COUNT({expr}), {scale})"
