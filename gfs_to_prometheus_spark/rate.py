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


def irate(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL irate(): per-second rate from the LAST TWO samples of each
    (series, bucket) — the spiky-counter estimator. Reset rule as rate():
    a drop counts from 0 (the post-reset value is the increase). Buckets
    with a single sample yield NULL. Transport is int64-micro; ONE double
    division at the end, so both engines agree bit-for-bit.

    Boundary convention: the pair must lie INSIDE the bucket (strict
    PromQL range semantics for the instant estimators, unlike the
    bucketed changes()/resets() convention — documented there)."""
    from .timeutil import epoch_ms, micro

    d = _dedup_ts(df, series, ts, value).select(
        *series,
        bucket_ms(ts, step_s).alias("bucket_ms"),
        epoch_ms(ts).alias("_t"),
        micro(value).alias("_v"),
    )
    w = W.partitionBy(*series, "bucket_ms").orderBy("_t")
    d = d.withColumn("_pv", F.lag("_v").over(w)).withColumn(
        "_pt", F.lag("_t").over(w)
    )
    last = d.groupBy(*series, "bucket_ms").agg(
        F.max_by(F.struct("_v", "_pv", "_pt", "_t"), "_t").alias("_l")
    )
    v, pv = F.col("_l._v"), F.col("_l._pv")
    dt = F.col("_l._t") - F.col("_l._pt")
    inc = F.when(v >= pv, v - pv).otherwise(v)
    out = F.when(pv.isNull(), F.lit(None).cast("double")).otherwise(
        inc.cast("double") * F.lit(1000.0) / dt.cast("double")
    )
    return last.select(*series, "bucket_ms", out.alias("irate_micro_per_s"))


def idelta(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL idelta(): difference of the last two samples per (series,
    bucket) — gauge counterpart of irate (no reset rule). Single-sample
    buckets yield NULL. Exact int64-micro arithmetic end to end."""
    from .timeutil import epoch_ms, micro

    d = _dedup_ts(df, series, ts, value).select(
        *series,
        bucket_ms(ts, step_s).alias("bucket_ms"),
        epoch_ms(ts).alias("_t"),
        micro(value).alias("_v"),
    )
    w = W.partitionBy(*series, "bucket_ms").orderBy("_t")
    d = d.withColumn("_pv", F.lag("_v").over(w))
    last = d.groupBy(*series, "bucket_ms").agg(
        F.max_by(F.struct("_v", "_pv"), "_t").alias("_l")
    )
    return last.select(
        *series,
        "bucket_ms",
        (F.col("_l._v") - F.col("_l._pv")).alias("idelta_micro"),
    )


def over_time_aggs(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL min/max/sum/count_over_time in one pass per (series,
    bucket), int64-micro transport (order-independent, oracle-exact)."""
    from .timeutil import micro

    return df.groupBy(*series, bucket_ms(ts, step_s).alias("bucket_ms")).agg(
        F.min(micro(value)).alias("min_micro"),
        F.max(micro(value)).alias("max_micro"),
        F.sum(micro(value)).alias("sum_micro"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def stddev_over_time(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL stddev_over_time(): POPULATION stddev per (series, bucket).
    Exact integer moments (sum and sum-of-squares in decimal(38,0) ==
    DuckDB HUGEINT, immune to int64 overflow), one double sqrt/division:
    stddev = sqrt(n*s2 - s1^2) / n, in micro units."""
    from .timeutil import micro

    yd = micro(value).cast("decimal(38,0)")
    agg = df.groupBy(*series, bucket_ms(ts, step_s).alias("bucket_ms")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(yd).alias("s1"),
        F.sum(yd * yd).alias("s2"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("n") * dec("s2") - dec("s1") * dec("s1")
    out = F.sqrt(num.cast("double")) / F.col("n").cast("double")
    return agg.select(*series, "bucket_ms", out.alias("stddev_micro"))


def predict_linear(
    df: DataFrame,
    step_s: int,
    horizon_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL predict_linear(): least-squares extrapolation horizon_s past
    the BUCKET END. Same exact-integer-moment scheme as deriv() (x is the
    ms offset from the bucket start, y int64-micro; cross moments in
    decimal(38,0) == HUGEINT), evaluated with one fixed double expression:

        yhat = (sy + num/den * (n*x0 - sx)) / n,  x0 = step+horizon in ms

    so DuckDB reproduces it bit-for-bit. Buckets with n < 2 or a singular
    x spread yield NULL."""
    from .timeutil import epoch_ms, micro

    b = bucket_ms(ts, step_s)
    pts = df.select(
        *series,
        b.alias("bucket_ms"),
        (epoch_ms(ts) - b).alias("x"),
        micro(value).alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    agg = pts.groupBy(*series, "bucket_ms").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    den = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    num = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    x0 = F.lit(float((step_s + horizon_s) * 1000))
    yhat = (
        F.col("sy").cast("double")
        + num.cast("double")
        / den.cast("double")
        * (F.col("n").cast("double") * x0 - F.col("sx").cast("double"))
    ) / F.col("n").cast("double")
    out = F.when(
        (F.col("n") < 2) | (den == F.lit(0).cast("decimal(38,0)")),
        F.lit(None).cast("double"),
    ).otherwise(yhat)
    return agg.select(*series, "bucket_ms", out.alias("predicted_micro"))


def holt_winters(
    df: DataFrame,
    step_s: int,
    sf: float,
    tf: float,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL holt_winters(v[range], sf, tf): double exponential smoothing
    per (series, bucket); returns the last smoothed value. Prometheus
    recurrence (promql/functions.go funcHoltWinters), applied in exactly
    its evaluation order so the fold is a fixed chain of IEEE double ops —
    DuckDB replays the same chain via a recursive CTE (one step per
    sample; NOT list_reduce, whose struct-literal lambdas evaluate
    fields sequentially in DuckDB 1.0 — see _HW_SQL in queries_rel.py):

        s0 = v[0];  b = v[1] - v[0]
        for v in v[1:]:
            s1 = sf*v + (1-sf)*(s0 + b)
            b  = tf*(s1 - s0) + (1-tf)*b
            s0 = s1

    Buckets with < 2 samples yield NULL (PromQL drops them). (1-sf) and
    (1-tf) are precomputed in PYTHON and embedded as repr() literals in
    both engines — ``1.0 - 0.3`` and the literal ``0.7`` are DIFFERENT
    doubles, so both sides must parse the same decimal string.

    Scale shape: one groupBy shuffle on (series, bucket); the fold runs
    JVM-side over the bucket's value array (bounded by samples-per-bucket,
    the same bound every *_over_time function carries).
    """
    from .timeutil import epoch_ms

    one_m_sf = 1.0 - sf
    one_m_tf = 1.0 - tf
    L = lambda x: F.lit(float(x))  # noqa: E731

    b = bucket_ms(ts, step_s)
    # ts unique per series in this model (same precondition as irate);
    # struct sort orders by ts first -> deterministic value order
    arr = F.array_sort(
        F.collect_list(F.struct(epoch_ms(ts).alias("t"), F.col(value).alias("v")))
    )
    agg = df.groupBy(*series, b.alias("bucket_ms")).agg(
        F.transform(arr, lambda x: x["v"].cast("double")).alias("vals")
    )
    vals = F.col("vals")
    n = F.size(vals)
    # F.get is 0-based and NULL-on-OOB (no ANSI throw on 1-sample buckets)
    v0, v1 = F.get(vals, 0), F.get(vals, 1)
    init = F.struct(v0.alias("s"), (v1 - v0).alias("b"))

    def step(acc, v):
        s1 = L(sf) * v + L(one_m_sf) * (acc["s"] + acc["b"])
        b1 = L(tf) * (s1 - acc["s"]) + L(one_m_tf) * acc["b"]
        return F.struct(s1.alias("s"), b1.alias("b"))

    folded = F.aggregate(F.slice(vals, 2, n - 1), init, step)
    out = F.when(n >= 2, folded["s"]).otherwise(F.lit(None).cast("double"))
    return agg.select(*series, "bucket_ms", out.alias("smoothed"))


def clamp(
    df: DataFrame,
    vmin: float | None = None,
    vmax: float | None = None,
    value: str = "value",
    out: str = "clamped",
) -> DataFrame:
    """PromQL clamp()/clamp_min()/clamp_max(): per-sample value clamping
    (pure Column exprs — scan-local, no shuffle). None skips that bound;
    clamp(min > max) yields NULL per PromQL (empty in Prometheus, NULL
    here so row identity is preserved for joins). NaN inputs propagate
    as NaN, matching Prometheus (Go math.Max/Min): Spark's
    greatest/least order NaN as the largest double, which would
    silently clamp NaN to the upper bound without the guard (ADVICE r5;
    note the DuckDB oracle shares Spark's NaN ordering, so oracle
    fixtures must stay NaN-free or compare via the same guard)."""
    raw = F.col(value).cast("double")
    c = raw
    if vmin is not None:
        c = F.greatest(c, F.lit(float(vmin)))
    if vmax is not None:
        c = F.least(c, F.lit(float(vmax)))
    if vmin is not None and vmax is not None and vmin > vmax:
        c = F.lit(None).cast("double")
    elif vmin is not None or vmax is not None:
        c = F.when(F.isnan(raw), raw).otherwise(c)
    return df.withColumn(out, c)


def sort_desc(
    df: DataFrame,
    value: str = "value",
    series: Sequence[str] = ("event_type",),
    ascending: bool = False,
) -> DataFrame:
    """PromQL sort()/sort_desc() over an instant vector: assign a dense
    1-based rank by value (ties broken by series key for determinism —
    PromQL's own tie order is unspecified). The global window is a
    deliberate single-partition shuffle: an instant vector has one row
    per SERIES (cardinality ~10^3..10^6, driver-sized output by
    definition), never one per sample — same shape as sorted listings."""
    vcol = F.col(value).asc() if ascending else F.col(value).desc()
    w = W.orderBy(vcol, *[F.col(s).asc() for s in series])
    return df.withColumn("rank", F.row_number().over(w))


def last_first_over_time(
    df: DataFrame,
    step_s: int,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """PromQL last_over_time / first_over_time in one pass per (series,
    bucket): the newest and oldest sample's value (max_by/min_by on ts —
    JVM-side, no window)."""
    return df.groupBy(*series, bucket_ms(ts, step_s).alias("bucket_ms")).agg(
        F.max_by(value, ts).alias("last_value"),
        F.min_by(value, ts).alias("first_value"),
    )


def absent_over_time(
    df: DataFrame,
    step_s: int,
    present,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
) -> DataFrame:
    """PromQL absent_over_time(selector[step]): emit value 1 for every
    (series, bucket) of the evaluation grid where NO sample satisfies the
    selector predicate ``present`` (a boolean Column). The grid spans each
    series' observed [min, max] bucket — the same sequence()-explode shape
    as gap-fill, so grid size is series x buckets (tier-sized, never
    sample-sized); the anti-join is one shuffle on (series, bucket)."""
    step_ms = step_s * 1000
    b_idx = (bucket_ms(ts, step_s) / F.lit(step_ms)).cast("long")
    bounds = df.groupBy(*series).agg(
        F.min(b_idx).alias("_b0"), F.max(b_idx).alias("_b1")
    )
    grid = bounds.select(
        *series, F.explode(F.sequence("_b0", "_b1")).alias("_bi")
    ).select(*series, (F.col("_bi") * F.lit(step_ms)).alias("bucket_ms"))
    observed = (
        df.filter(present)
        .select(*series, (b_idx * F.lit(step_ms)).alias("bucket_ms"))
        .distinct()
    )
    keys = [*series, "bucket_ms"]
    return grid.join(observed, keys, "left_anti").withColumn(
        "absent", F.lit(1)
    )
