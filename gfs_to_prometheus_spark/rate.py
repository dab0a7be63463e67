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


def _dedup_ts(df, series, ts, value):
    """Collapse (series, ts) ties to max(value) so every lag window below
    has a deterministic order — the same guard gauge_delta uses; a no-op
    when timestamps are unique per series."""
    return df.groupBy(*series, F.col(ts).alias(ts)).agg(
        F.max(value).alias(value)
    )


def _lag_count(df, pred_fn, out_name, step_s, series, ts, value):
    d = _dedup_ts(df, series, ts, value).withColumn(
        "_prev", F.lag(value).over(W.partitionBy(*series).orderBy(ts))
    )
    flag = (F.col("_prev").isNotNull() & pred_fn(F.col(value), F.col("_prev"))).cast(
        "long"
    )
    return (
        d.groupBy(*series, bucket_ms(ts, step_s).alias("bucket_ms"))
        .agg(F.sum(flag).alias(out_name))
    )


def changes(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL changes() under BUCKETED-window semantics: number of value
    CHANGES per (series, bucket) — ts-tie dedup, lag window per series,
    then the same one-shuffle bucket agg as increase().

    Boundary convention (deliberate divergence, like increase()'s): the
    first sample of a bucket is compared against the LAST sample of the
    previous bucket, so a change that straddles a boundary counts in the
    later bucket. True PromQL range windows exclude the pre-window
    predecessor; over tumbling buckets that would silently drop every
    boundary change, which is the wrong total for rollup consumers. The
    SQL oracle mirrors this definition. First sample of a series is not
    a change."""
    return _lag_count(df, lambda v, p: v != p, "changes", step_s, series, ts, value)


def resets(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL resets() under BUCKETED-window semantics: counter-decrease
    count per (series, bucket). Same boundary convention as changes():
    a reset straddling a bucket boundary counts in the later bucket
    (strict PromQL range windows would drop it entirely)."""
    return _lag_count(df, lambda v, p: v < p, "resets", step_s, series, ts, value)


def gauge_delta(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL delta() for gauges: last - first observed value per
    (series, bucket), exact (no extrapolation), scaled-int64 transport so
    the subtraction is order-independent and oracle-exact."""
    from .timeutil import micro

    # dedupe ts ties first (max value wins) so max_by/min_by keys are
    # unique -> deterministic across engines
    per_ts = df.groupBy(
        *series, bucket_ms(ts, step_s).alias("bucket_ms"), F.col(ts).alias("_t")
    ).agg(F.max(micro(value)).alias("_v"))
    return per_ts.groupBy(*series, "bucket_ms").agg(
        (F.max_by("_v", "_t") - F.min_by("_v", "_t")).alias("delta_micro")
    )
