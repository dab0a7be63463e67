"""Continuous aggregates (rollup tiers) and PromQL-style re-aggregation.

Reference parity: the reference writes raw samples into Prometheus TSDB and
leaves aggregation to PromQL (SURVEY.md §2.6). Its documented query surface
(/root/reference/README.md:146-158, grafana/dashboards/gemfire-cluster.json)
is rate / sum-by / count-by / topk / quantile; the north_rule materializes
these as 5m/1h/1d continuous aggregates with min/max/sum/count/last.

Scale notes
-----------
* Each tier is ONE hash aggregate: Spark performs partial (map-side)
  aggregation before the shuffle, so a hot series (1% of series carrying
  50% of samples, FIXTURES.md §2) is combined locally first — no explicit
  salting is needed for built-in aggs. Salting is reserved for
  ``applyInPandas`` group work (chunks.py) where no partial-agg exists.
* Higher tiers re-aggregate the next-lower tier (1h from 5m, 1d from 1h):
  at 100 TB this reads ~1/300th of the raw data instead of rescanning.
* ``sum`` is carried as scaled int64 (timeutil.micro) so partial/final
  combine order cannot change the result — exact-match across engines and
  across cluster sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .timeutil import bucket_ms, epoch_ms, micro

#: rollup tier steps, seconds (north_rule: 5m / 1h / 1d)
TIERS = {"5m": 300, "1h": 3600, "1d": 86400}

#: columns produced per (series, bucket)
ROLLUP_FIELDS = ("vmin", "vmax", "sum_micro", "cnt", "last", "last_ts_ms")


def rollup(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """One rollup tier from raw samples.

    Output: series..., bucket_ms, vmin, vmax, sum_micro, cnt, last,
    last_ts_ms. ``last`` is the value at max ts (max_by — deterministic
    because (series, ts) is unique in our sources); ``last_ts_ms`` is kept
    so higher tiers can merge ``last`` without rescanning raw data.
    """
    return (
        df.groupBy(*series, bucket_ms(ts, step_s).alias("bucket_ms"))
        .agg(
            F.min(value).alias("vmin"),
            F.max(value).alias("vmax"),
            F.sum(micro(value)).alias("sum_micro"),
            F.count(F.lit(1)).alias("cnt"),
            F.max_by(value, ts).alias("last"),
            F.max(epoch_ms(ts)).alias("last_ts_ms"),
        )
    )


def rollup_merge(
    tier: DataFrame, step_s: int, series: Sequence[str] = ("event_type",)
) -> DataFrame:
    """Next tier from a finer tier (partial+final reuse, A9).

    min/max/sum/count merge associatively; ``last`` merges via the carried
    last_ts_ms. Result is identical to a direct rollup of the raw samples.
    """
    step_ms = step_s * 1000
    b = (F.floor(F.col("bucket_ms") / F.lit(step_ms)) * step_ms).cast("long")
    return (
        tier.groupBy(*series, b.alias("bucket_ms"))
        .agg(
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.sum("sum_micro").alias("sum_micro"),
            F.sum("cnt").alias("cnt"),
            F.max_by("last", "last_ts_ms").alias("last"),
            F.max("last_ts_ms").alias("last_ts_ms"),
        )
    )


def sum_by(
    tier: DataFrame, by: Sequence[str], measure: str = "sum_micro"
) -> DataFrame:
    """PromQL ``sum(...) by (labels)`` over a rollup tier (A4)."""
    return tier.groupBy(*by).agg(F.sum(measure).alias(measure))


def topk(
    tier: DataFrame,
    k: int,
    by: Sequence[str],
    rank_within: Sequence[str],
    measure: str = "sum_micro",
) -> DataFrame:
    """PromQL ``topk(k, ...)`` (A6): rank window + filter, never a global
    sort. ``by`` identifies the ranked entity, ``rank_within`` the scope.
    Ties broken by the entity key for determinism.
    """
    from pyspark.sql import Window as W

    agg = tier.groupBy(*rank_within, *by).agg(F.sum(measure).alias(measure))
    w = W.partitionBy(*rank_within).orderBy(
        F.desc(measure), *[F.asc(c) for c in by]
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bottomk(
    tier: DataFrame,
    k: int,
    by: Sequence[str],
    rank_within: Sequence[str],
    measure: str = "sum_micro",
) -> DataFrame:
    """PromQL ``bottomk(k, ...)``: topk's ascending twin — rank window +
    filter, never a global sort; ties broken by the entity key."""
    from pyspark.sql import Window as W

    agg = tier.groupBy(*rank_within, *by).agg(F.sum(measure).alias(measure))
    w = W.partitionBy(*rank_within).orderBy(
        F.asc(measure), *[F.asc(c) for c in by]
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
