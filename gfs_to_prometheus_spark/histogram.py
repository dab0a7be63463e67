"""PromQL histogram_quantile over le-bucketed counts (A8's at-scale
sibling: one pass, no per-group sort — the exact interpolated quantile in
queries.py needs a per-group sort window; this is the fixed-memory
histogram estimate Prometheus itself serves).

Semantics follow PromQL: cumulative bucket counts c_k = |{v <= le_k}|;
rank = q * total; the answer interpolates linearly inside the first
bucket whose cumulative count reaches the rank, from the previous bound
(0 before the first bucket); ranks beyond the last finite bucket return
the highest finite bound. All arithmetic is one fixed double expression
so a SQL oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

DEFAULT_LES = (10.0, 25.0, 50.0, 100.0, 250.0, 500.0)


def histogram_buckets(
    df: DataFrame,
    les: Sequence[float] = DEFAULT_LES,
    series: Sequence[str] = ("event_type",),
    value: str = "value",
) -> DataFrame:
    """Cumulative le-bucket counts per series — ONE hash aggregate (each
    bucket is a conditional sum; partial-aggregated map-side)."""
    aggs = [
        F.sum((F.col(value) <= F.lit(float(le))).cast("long")).alias(f"c{k}")
        for k, le in enumerate(les)
    ]
    return df.groupBy(*series).agg(*aggs, F.count(F.lit(1)).alias("total"))


def histogram_quantile(
    df: DataFrame,
    q: float,
    les: Sequence[float] = DEFAULT_LES,
    series: Sequence[str] = ("event_type",),
    value: str = "value",
) -> DataFrame:
    """Per-series q-quantile estimate from the cumulative buckets."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")  # q=0 would be 0/0
    b = histogram_buckets(df, les, series, value)
    rank = F.lit(float(q)) * F.col("total").cast("double")
    expr = F.lit(float(les[-1]))  # beyond the last finite bucket
    # build the CASE chain from the last bucket backwards so the FIRST
    # bucket reaching the rank wins
    for k in range(len(les) - 1, -1, -1):
        lo = F.lit(0.0) if k == 0 else F.lit(float(les[k - 1]))
        c_prev = F.lit(0).cast("long") if k == 0 else F.col(f"c{k-1}")
        interp = lo + (F.lit(float(les[k])) - lo) * (
            (rank - c_prev.cast("double"))
            / (F.col(f"c{k}") - c_prev).cast("double")
        )
        expr = F.when(F.col(f"c{k}").cast("double") >= rank, interp).otherwise(expr)
    return b.select(*series, expr.alias("quantile"))


def histogram_stats(
    df: DataFrame,
    series: Sequence[str] = ("event_type",),
    value: str = "value",
) -> DataFrame:
    """PromQL histogram_sum / histogram_count / histogram_avg: the _sum
    and _count companion series of a histogram, and their ratio — exact
    int64-micro sum with ONE double division (same one-pass agg family
    as histogram_buckets)."""
    from .timeutil import micro

    return df.groupBy(*series).agg(
        F.sum(micro(value)).alias("hist_sum_micro"),
        F.count(F.lit(1)).alias("hist_count"),
    ).withColumn(
        "hist_avg_micro",
        F.col("hist_sum_micro").cast("double")
        / F.col("hist_count").cast("double"),
    )
