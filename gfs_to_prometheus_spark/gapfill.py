"""LOCF / linear gap-fill over grid-step windows (SURVEY.md §2.8).

The reference's sample stream is sparse — a series has no row when nothing
changed (internal/gfs/statarchive.go:647-685); Geode/VSD semantics densify
with last-observation-carried-forward (java-extractor/
AllStatsExtractor.java:47-76). Here the dense grid is built with
``sequence()`` + explode (no driver loop), gaps filled with window
functions — all JVM-side whole-stage-codegen; no Python in the path.

Scale: the grid explode multiplies rows by (range/step)/samples-per-series;
the window is per-series so it shuffles once on the series key. For very
long ranges, bound the grid by partitioning windows on (series, day) after
a first LOCF pass — not needed at current tiers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F

from .timeutil import bucket_ms


def grid(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Dense (series × bucket) grid over each series' OWN [min,max] range,
    left-joined with the per-bucket last observation. Missing buckets have
    NULL ``obs``.

    Per-series ranges keep the grid size at Σ per-series spans instead of
    (#series × global span): with short-lived series at 100× scale, a
    global range explodes dead air for every series that wasn't alive —
    the ranges come from the same single agg that provides the key list,
    so this is one shuffle total."""
    step_ms = step_s * 1000
    # per-bucket last observation (sparse)
    sparse = (
        df.groupBy(*series, bucket_ms(ts, step_s).alias("bucket_ms"))
        .agg(F.max_by(value, ts).alias("obs"))
    )
    rng = df.groupBy(*series).agg(
        F.min(bucket_ms(ts, step_s)).alias("b0"),
        F.max(bucket_ms(ts, step_s)).alias("b1"),
    )
    dense = rng.select(
        *series,
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.lit(step_ms))
        ).alias("bucket_ms"),
    )
    return dense.join(sparse, [*series, "bucket_ms"], "left")


def sparse_encode(
    df: DataFrame,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """F6 encode direction — the reference's only-changed-stats stream
    (internal/gfs/statarchive.go:647-685 writes a sample only when the stat
    differs from its previous value). Keeps each series' first sample and
    every change point; drops runs of repeats. Timestamp ties are deduped
    to the max value first (same deterministic rule as changes()/resets())
    so the lag predecessor is well-defined in both engines.

    Roundtrip law (test_gapfill): ``locf(sparse_encode(x)) == locf(x)`` on
    every grid bucket up to the encoded stream's last change — a dropped
    sample always equals its predecessor, so LOCF reconstructs it exactly.

    Scale: one shuffle on the series key (tie-dedup agg + lag window share
    the partitioning); the filter is a narrow post-window map.
    """
    d = df.groupBy(*series, ts).agg(F.max(value).alias(value))
    w = W.partitionBy(*series).orderBy(ts)
    prev = F.lag(value).over(w)
    return (
        d.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col(value) != F.col("_prev")))
        .drop("_prev")
    )


def locf(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Grid + last-observation-carried-forward. ``filled`` stays NULL before
    a series' first sample (Prometheus staleness analog)."""
    g = grid(df, step_s, series, ts, value)
    w = (
        W.partitionBy(*series)
        .orderBy("bucket_ms")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return g.withColumn("filled", F.last("obs", ignorenulls=True).over(w))


def linear(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Grid + linear interpolation between the previous and next observed
    buckets; LOCF after the last observation, NULL before the first.

    The blend is evaluated with one fixed double-precision expression so
    the oracle can reproduce it bit-for-bit:
        prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
    """
    g = grid(df, step_s, series, ts, value)
    t = F.col("bucket_ms").cast("double")
    wb = W.partitionBy(*series).orderBy("bucket_ms").rowsBetween(
        W.unboundedPreceding, 0
    )
    wf = W.partitionBy(*series).orderBy("bucket_ms").rowsBetween(
        0, W.unboundedFollowing
    )
    obs_t = F.when(F.col("obs").isNotNull(), t)
    g = (
        g.withColumn("pv", F.last("obs", ignorenulls=True).over(wb))
        .withColumn("pt", F.last(obs_t, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("obs", ignorenulls=True).over(wf))
        .withColumn("nt", F.first(obs_t, ignorenulls=True).over(wf))
    )
    blend = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (t - F.col("pt")) / (F.col("nt") - F.col("pt"))
    )
    filled = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(F.col("pv").isNull(), F.lit(None))
        .when(F.col("nv").isNull(), F.col("pv"))  # LOCF tail
        .otherwise(blend)
    )
    return g.select(*series, "bucket_ms", "obs", filled.alias("filled"))
