"""Gap-fill grid semantics: per-series ranges (scale-safe form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gfs_to_prometheus_spark import gapfill


def test_grid_is_per_series_range(spark):
    rows = [
        ("long", 0, 1.0), ("long", 10_000_000, 2.0),   # spans ~2.8h
        ("short", 5_000_000, 9.0), ("short", 5_100_000, 9.5),  # ~2 min
    ]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double") \
        .select("event_type", F.timestamp_millis("ts_ms").alias("ts"), "value")
    g = gapfill.grid(df, 3600, series=("event_type",))
    cnt = {r["event_type"]: r["n"] for r in
           g.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    # long: buckets 0..7200000 step 3.6e6 -> 3; short: one bucket only
    assert cnt == {"long": 3, "short": 1}
    # LOCF over the per-series grid still fills interior gaps
    filled = gapfill.locf(df, 3600, series=("event_type",))
    got = {(r["event_type"], r["bucket_ms"]): r["filled"] for r in filled.collect()}
    assert got[("long", 3_600_000)] == 1.0  # carried forward
    assert got[("long", 7_200_000)] == 2.0
    assert got[("short", 3_600_000)] == 9.5


def test_grid_single_shuffle(spark):
    """The dense side must be ONE aggregate (ranges + keys together), not
    distinct-keys x global-range: exactly one exchange below the explode."""
    rows = [("a", 0, 1.0), ("a", 7_200_000, 2.0)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double") \
        .select("event_type", F.timestamp_millis("ts_ms").alias("ts"), "value")
    plan = gapfill.grid(df, 3600)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_sparse_encode_roundtrip_law(spark):
    """F6: locf(sparse_encode(x)) == locf(x) on every common grid bucket —
    a dropped sample always equals its predecessor, so LOCF reconstructs
    the dense stream exactly (the reference's only-changed-stats storage
    is lossless under LOCF densify)."""
    from gfs_to_prometheus_spark import gapfill

    rows = []
    # series A: runs of repeats, changes, a repeated tail
    vals = [1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 3.0]
    rows += [("A", 1_700_000_000_000 + i * 1_800_000, v) for i, v in enumerate(vals)]
    # series B: constant (encodes to a single sample)
    rows += [("B", 1_700_000_000_000 + i * 1_800_000, 7.0) for i in range(6)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, value double"
    ).select("event_type", F.timestamp_millis("ts_ms").alias("ts"), "value")

    enc = gapfill.sparse_encode(df)
    # encoded sizes: A keeps first + 2 change points, B keeps 1
    sizes = {r["event_type"]: r["n"] for r in
             enc.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"A": 3, "B": 1}

    full = gapfill.locf(df, 3600).select("event_type", "bucket_ms", "filled")
    rt = gapfill.locf(enc, 3600).select(
        "event_type", "bucket_ms", F.col("filled").alias("rt")
    )
    j = full.join(rt, ["event_type", "bucket_ms"], "inner")
    assert j.count() == rt.count()  # encoded grid is a prefix of the full grid
    assert j.filter(F.col("filled") != F.col("rt")).count() == 0
