"""Deterministic cross-engine arithmetic helpers.

Exact-match against the DuckDB oracle (and against the reference's
integer-ms / float64 semantics, /root/reference/internal/tsdb/writer.go:60)
requires order-independent aggregation. Doubles summed in shuffle order are
NOT deterministic, so every summable measure is first converted to a scaled
int64 ("micros", 1e-6 resolution) with an IEEE-identical formula on both
engines:  floor(x * 1e6 + 0.5)  — plain float multiply + floor, bit-equal
everywhere.  Time buckets are integer floor-division of epoch-ms, matching
the reference's ms-epoch timestamps (internal/gfs/statarchive.go:1240-1245).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICRO = 1_000_000


def epoch_ms(ts: Column | str) -> Column:
    """Epoch milliseconds (bigint). Parquet timestamps load as
    TIMESTAMP_NTZ in Spark 4; with session TZ pinned to UTC the cast to
    TIMESTAMP is the identity, matching DuckDB's naive-UTC epoch_ms()."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_millis(c.cast("timestamp"))


def bucket_ms(ts: Column | str, step_s: int) -> Column:
    """Tumbling-window start in epoch ms (bigint), epoch-aligned.

    Equivalent SQL (DuckDB): (epoch_ms(ts) // (step_s*1000)) * (step_s*1000)
    """
    step_ms = step_s * 1000
    return (F.floor(epoch_ms(ts) / F.lit(step_ms)) * step_ms).cast("long")


def sql_bucket_ms(ts_expr: str, step_s: int) -> str:
    step_ms = step_s * 1000
    return f"(epoch_ms({ts_expr}) // {step_ms}) * {step_ms}"


def micro(col: Column | str) -> Column:
    """Scaled-int64 measure: floor(x*1e6 + 0.5) — deterministic sums.

    Equivalent SQL (DuckDB): CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def sql_micro(expr: str) -> str:
    return f"CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)"
