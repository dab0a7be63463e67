"""PromQL-style ``rate()`` / ``increase()`` with counter-reset correction.

Counter semantics come from the reference's ``IsCounter`` stat flag
(/root/reference/internal/gfs/parser.go:38); the query surface is
``rate(m[5m])`` (/root/reference/README.md:146-158). A counter reset is a
sample lower than its predecessor (process restart): PromQL treats the
post-reset value as a fresh increase from 0.

Implemented as lag-window + hash aggregate — fully JVM-side/codegen (the
SURVEY anticipated a pandas UDF; the lag formulation is strictly better:
one shuffle on the series key, vectorized, SQL-expressible for oracles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F

from .timeutil import bucket_ms


def increase(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    counter: str = "counter",
) -> DataFrame:
    """Reset-corrected increase per (series, bucket).

    delta = v - lag(v); a negative delta is a reset and contributes the
    full post-reset value v. The first sample of a series contributes 0
    (no prior point to diff against), matching PromQL increase-extrapolation
    disabled (exact, not extrapolated — our rollups are exact aggregates).
    """
    w = W.partitionBy(*series).orderBy(ts)
    d = df.withColumn("_prev", F.lag(counter).over(w))
    contrib = (
        F.when(F.col("_prev").isNull(), F.lit(0))
        .when(F.col(counter) >= F.col("_prev"), F.col(counter) - F.col("_prev"))
        .otherwise(F.col(counter))  # reset: count from 0
    )
    return (
        d.groupBy(*series, bucket_ms(ts, step_s).alias("bucket_ms"))
        .agg(F.sum(contrib).alias("increase"))
    )


def rate(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    counter: str = "counter",
) -> DataFrame:
    """increase / window-seconds — per-second rate (A3)."""
    inc = increase(df, step_s, series, ts, counter)
    return inc.withColumn(
        "rate", (F.col("increase").cast("double") / F.lit(float(step_s)))
    )
