"""Query API over the materialized tier tables — the surface a user of
the reference (PromQL against the TSDB it writes,
/root/reference/README.md:146-158) migrates to:

    eng = Engine(spark, "/data/tsdb")
    eng.range_query("sum", step="1h", by=["series_key"], start=..., end=...)
    eng.rate(step="5m")                      # reset-corrected, from raw chunks
    eng.topk(5, step="1h")
    eng.instant(at_ms, fill="locf")          # point-in-time with staleness

Tier selection mirrors Prometheus recording rules + Thanos downsampling:
the engine picks the coarsest tier whose step divides the requested step
(5m -> 1h -> 1d), so a 1d query over a year reads 288x fewer rows than
the 5m tier, and partition pruning on `part` limits the scan to the
requested time range.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import chunks as chunks_mod, gapfill
from .rollup import TIERS, rollup_merge

# lazy: building Columns at import time requires an active SparkSession
_AGG_COLS = {
    "min": lambda: F.min("vmin"),
    "max": lambda: F.max("vmax"),
    "sum": lambda: F.sum("sum_micro"),
    "count": lambda: F.sum("cnt"),
    "last": lambda: F.max_by("last", "last_ts_ms"),
    # PromQL avg(): exact int64 micro sum / exact count, ONE double
    # division at the end — tier-mergeable (sum and count both are),
    # which a naive avg-of-avgs would not be
    "avg": lambda: (
        F.sum("sum_micro").cast("double") / F.sum("cnt").cast("double")
    ),
}


class Engine:
    def __init__(self, spark: SparkSession, root: str, series: Sequence[str] = ("series_key",)):
        self.spark = spark
        self.root = root
        self.series = list(series)

    # -- tier routing --------------------------------------------------

    def _best_tier(self, step_s: int) -> tuple[str, int]:
        """Coarsest materialized tier whose step divides the request.

        A request no tier divides (e.g. step=60) cannot be served from
        rollups — re-bucketing 5m aggregates into 60s buckets would
        silently return wrong numbers — so it raises; callers needing
        sub-5m resolution go through the raw chunks path (Engine.rate /
        chunks decode)."""
        best: tuple[str, int] | None = None
        for name, s in (("rollup_5m", 300), ("rollup_1h", 3600), ("rollup_1d", 86400)):
            if step_s % s == 0:
                best = (name, s)
        if best is None:
            raise ValueError(
                f"step {step_s}s is not a multiple of any materialized tier "
                "(300/3600/86400s); query raw chunks for sub-5m resolution"
            )
        return best

    def tier(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, name))

    # -- queries -------------------------------------------------------

    def range_query(
        self,
        agg: str,
        step: str | int,
        by: Sequence[str] | None = None,
        start_ms: int | None = None,
        end_ms: int | None = None,
        offset_s: int = 0,
        matchers: dict[str, str] | None = None,
    ) -> DataFrame:
        """Aggregate per (by, step-bucket) from the best tier; time-range
        predicates prune day partitions before the scan.

        ``matchers`` is the PromQL vector selector ({__name__="m",
        label=~"re"} via :func:`select_series`) applied to the tier frame
        BEFORE anything else — plain column predicates, so Catalyst pushes
        them into the scan. ``by=[]`` aggregates across all matched series
        (PromQL ``sum(...)`` with no ``by`` clause).

        ``offset_s`` is the PromQL ``offset`` modifier: evaluate over data
        shifted ``offset_s`` into the past but REPORT at the requested
        timestamps (bucket_ms in the output stays request-aligned). The
        offset must preserve bucket alignment (a multiple of the step),
        exactly like PromQL's rule that offsets respect the resolution."""
        step_s = TIERS[step] if isinstance(step, str) else int(step)
        off_ms = offset_s * 1000
        if offset_s and offset_s % step_s != 0:
            raise ValueError(
                f"offset {offset_s}s must be a multiple of step {step_s}s"
            )
        tname, tstep = self._best_tier(step_s)
        df = self.tier(tname)
        if matchers:
            df = select_series(df, matchers, key=self.series[0])
        if start_ms is not None:
            df = df.filter(F.col("bucket_ms") >= start_ms - off_ms)
        if end_ms is not None:
            df = df.filter(F.col("bucket_ms") < end_ms - off_ms)
        by = list(by) if by is not None else self.series
        if step_s != tstep:
            df = rollup_merge(df, step_s, series=self.series)
        if agg not in _AGG_COLS:
            raise ValueError(f"agg must be one of {sorted(_AGG_COLS)}")
        # PromQL `sum by (label)`: a `by` entry that is not a physical
        # column is a LABEL of the series key — derive it as a column
        # expression (scan-local regexp, no extra shuffle: the groupBy
        # below shuffles on the derived value exactly once)
        df, by = _attach_label_columns(df, by, key=self.series[0])
        out = df.groupBy(*by, "bucket_ms").agg(_AGG_COLS[agg]().alias(agg))
        if off_ms:
            out = out.withColumn("bucket_ms", F.col("bucket_ms") + off_ms)
        return out

    def topk(
        self, k: int, step: str | int, measure: str = "sum_micro",
        start_ms: int | None = None, end_ms: int | None = None,
    ) -> DataFrame:
        from .rollup import topk as _topk

        step_s = TIERS[step] if isinstance(step, str) else int(step)
        tname, _ = self._best_tier(step_s)
        df = self.tier(tname)
        if start_ms is not None:
            df = df.filter(F.col("bucket_ms") >= start_ms)
        if end_ms is not None:
            df = df.filter(F.col("bucket_ms") < end_ms)
        return _topk(df, k, by=self.series, rank_within=[], measure=measure)

    def rate(
        self, step: str | int = "5m", by: Sequence[str] | None = None
    ) -> DataFrame:
        """Reset-corrected per-second rate from the raw chunk table (rate
        needs adjacent-sample deltas, which rollups do not retain).

        ``by`` adds the PromQL dashboard shape ``sum by (label)(rate(...))``
        (/root/reference/README.md:148 `sum by (node_type)(rate(...))`):
        the per-series rate is computed FIRST (reset correction is
        per-series by definition), then increase/rate are summed across
        series per (label, bucket). Labels are parsed from the series key
        as column expressions; the extra groupBy is the only added
        shuffle, and it runs over rate ROWS (series x buckets), not raw
        samples."""
        from .rate import rate as _rate

        step_s = TIERS[step] if isinstance(step, str) else int(step)
        raw = chunks_mod.decode_chunks(self.tier("chunks"), series=self.series)
        samples = raw.select(
            *self.series,
            F.timestamp_millis(F.col("ts_ms")).alias("ts"),
            F.col("value").alias("counter"),
        )
        per_series = _rate(samples, step_s, series=self.series)
        if by is None:
            return per_series
        per_series, by_cols = _attach_label_columns(
            per_series, list(by), key=self.series[0]
        )
        return per_series.groupBy(*by_cols, "bucket_ms").agg(
            F.sum("increase").alias("increase"),
            F.sum("rate").alias("rate"),
        )

    def instant(
        self, at_ms: int, fill: str = "locf", lookback_s: int = 3600,
        offset_s: int = 0,
    ) -> DataFrame:
        """Point-in-time value per series: last observation within the
        lookback window (Prometheus instant-vector staleness semantics).
        ``offset_s`` evaluates at ``at_ms - offset_s*1000`` (the PromQL
        offset modifier); as_of_ms reports the actual sample time."""
        at_ms = at_ms - offset_s * 1000
        t5 = self.tier("rollup_5m").filter(
            (F.col("bucket_ms") <= at_ms)
            & (F.col("bucket_ms") > at_ms - lookback_s * 1000)
        )
        return t5.groupBy(*self.series).agg(
            F.max_by("last", "last_ts_ms").alias("value"),
            F.max("last_ts_ms").alias("as_of_ms"),
        )

    def gapfilled(self, step_s: int = 300, method: str = "locf") -> DataFrame:
        raw = chunks_mod.decode_chunks(self.tier("chunks"), series=self.series)
        samples = raw.select(
            *self.series,
            F.timestamp_millis(F.col("ts_ms")).alias("ts"),
            "value",
        )
        fn = gapfill.locf if method == "locf" else gapfill.linear
        return fn(samples, step_s, series=self.series)


def _attach_label_columns(df, by: list[str], key: str):
    """For each ``by`` entry that is not a physical column, attach it as a
    label parsed from the series key (PromQL ``by (label)`` grouping).
    Returns (df, by) with every entry now a real column."""
    from .naming import series_label, series_metric

    for b in by:
        if b in df.columns:
            continue
        col = (
            series_metric(F.col(key))
            if b == "__name__"
            else series_label(F.col(key), b)
        )
        df = df.withColumn(b, col)
    return df, by


def select_series(
    df, matchers: dict[str, str], key: str = "series_key"
):
    """PromQL-style vector selection over 'metric{k=v,...}' series keys:
    matchers = {"__name__": "exact", "label": "=~regex"} — values starting
    with '=~' are anchored regexes, anything else exact. Pure column
    predicates (scan-filterable, no shuffle)."""
    from .naming import series_label, series_metric

    out = df
    for label, want in matchers.items():
        col = (
            series_metric(F.col(key))
            if label == "__name__"
            else series_label(F.col(key), label)
        )
        if want.startswith("=~"):
            out = out.filter(col.rlike("^(" + want[2:] + ")$"))
        else:
            out = out.filter(col == want)
    return out
