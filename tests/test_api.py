"""Engine query API over a materialized pipeline output: tier routing,
range/topk/rate/instant answers cross-checked against direct computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfs_to_prometheus_spark.api import Engine
from jobs import pipeline

N_DOCS = 300


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tsdb"))
    pipeline.run(spark, out, N_DOCS, job_id="api")
    return Engine(spark, out)


def test_tier_routing(engine):
    assert engine._best_tier(300) == ("rollup_5m", 300)
    assert engine._best_tier(3600) == ("rollup_1h", 3600)
    assert engine._best_tier(7200) == ("rollup_1h", 3600)
    assert engine._best_tier(86400) == ("rollup_1d", 86400)
    import pytest as _pt

    with _pt.raises(ValueError, match="not a multiple"):
        engine._best_tier(450)  # no tier divides 450s -> must refuse


def test_range_query_matches_direct(engine, spark):
    got = {
        (r["series_key"], r["bucket_ms"]): r["sum"]
        for r in engine.range_query("sum", step="1d").collect()
    }
    direct = {
        (r["series_key"], r["bucket_ms"]): r["sum_micro"]
        for r in engine.tier("rollup_1d").collect()
    }
    assert got == direct
    # 2h step routes through the 1h tier and re-buckets losslessly
    h2 = engine.range_query("count", step=7200)
    total = sum(r["count"] for r in h2.collect())
    assert total == engine.tier("rollup_5m").agg(F.sum("cnt")).collect()[0][0]


def test_rate_and_instant_shapes(engine):
    r = engine.rate("5m")
    row = r.filter(F.col("rate") > 0).first()
    assert row is not None and row["increase"] >= 0
    at = engine.tier("rollup_5m").agg(F.max("last_ts_ms")).collect()[0][0]
    inst = engine.instant(at_ms=at + 1)
    assert inst.count() > 0
    assert all(x["as_of_ms"] <= at + 1 for x in inst.collect())


def test_topk(engine):
    top = engine.topk(3, step="1h").collect()
    assert len(top) == 3
    # the hot series must win
    assert top[0]["series_key"] == "series_0"


def test_range_query_rejects_unservable_step(engine):
    import pytest as _pt

    with _pt.raises(ValueError, match="not a multiple"):
        engine.range_query("avg", 60)


def test_histogram_quantile_brackets_exact(spark):
    """The histogram estimate must land within the bucket that contains
    the exact quantile, and be exact when values sit on bucket bounds."""
    from gfs_to_prometheus_spark.histogram import histogram_quantile

    rows = [("a", float(v)) for v in range(1, 101)]  # uniform 1..100
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = histogram_quantile(df, 0.9, les=(10.0, 25.0, 50.0, 100.0)).collect()
    q = got[0]["quantile"]
    # exact p90 of 1..100 is 90; uniform within (50,100] -> interp ~ 90
    assert 85.0 <= q <= 95.0
    # rank beyond last finite bucket -> highest bound
    got2 = histogram_quantile(df, 0.999, les=(10.0, 25.0)).collect()
    assert got2[0]["quantile"] == 25.0


def test_select_series_matchers(spark):
    from gfs_to_prometheus_spark.api import select_series

    rows = [
        ("requests{env=prod,type=click}", 1.0),
        ("requests{env=dev,type=click}", 2.0),
        ("errors{env=prod,type=x}", 3.0),
    ]
    df = spark.createDataFrame(rows, "series_key string, value double")
    got = {r["value"] for r in select_series(
        df, {"__name__": "requests", "env": "prod"}).collect()}
    assert got == {1.0}
    got = {r["value"] for r in select_series(df, {"type": "=~click|x"}).collect()}
    assert got == {1.0, 2.0, 3.0}


def test_offset_modifier(engine):
    """PromQL offset: same values as the unshifted query over the shifted
    window, reported at request-aligned timestamps."""
    import pytest as _pt

    rows = sorted(
        (r["series_key"], r["bucket_ms"], r["sum"])
        for r in engine.range_query("sum", step="1h").collect()
    )
    assert rows
    start = min(b for _, b, _ in rows)
    off = engine.range_query(
        "sum", step="1h", start_ms=start + 3_600_000, offset_s=3600
    ).collect()
    got = sorted((r["series_key"], r["bucket_ms"], r["sum"]) for r in off)
    want = sorted(
        (s, b + 3_600_000, v)
        for s, b, v in rows
        if b + 3_600_000 >= start + 3_600_000
    )
    assert got == want
    with _pt.raises(ValueError, match="multiple of step"):
        engine.range_query("sum", step="1h", offset_s=1800)
    # instant with offset == instant evaluated in the past
    at = max(b for _, b, _ in rows) + 600_000
    a = {r["series_key"]: r["value"] for r in engine.instant(at).collect()}
    b = {
        r["series_key"]: r["value"]
        for r in engine.instant(at + 7_200_000, offset_s=7200).collect()
    }
    assert a == b


def test_range_query_sum_by_label(spark, tmp_path):
    """PromQL `sum by (label)`: a `by` entry that is not a physical column
    is parsed from the series key and grouped on (the dashboard's
    sum by (node_type)(...) shape)."""
    import datetime as dt

    from gfs_to_prometheus_spark.rollup import rollup

    utc = dt.timezone.utc
    rows = [
        (f"cpu{{node=n{i % 2},core=c{i}}}", dt.datetime(2024, 1, 1, 0, 0, i, tzinfo=utc), float(i))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "series_key string, ts timestamp, value double")
    root = str(tmp_path / "tsdb")
    rollup(df, 300, series=("series_key",)).write.parquet(root + "/rollup_5m")
    eng = Engine(spark, root)
    got = {
        r["node"]: r["sum"]
        for r in eng.range_query("sum", step="5m", by=["node"]).collect()
    }
    # micro units: n0 <- 0+2+4, n1 <- 1+3+5
    assert got == {"n0": 6_000_000, "n1": 9_000_000}


def test_rate_sum_by_label(spark, tmp_path):
    """sum by (label)(rate(...)): reset correction per SERIES first, then
    the cross-series sum per (label, bucket)."""
    import datetime as dt

    from gfs_to_prometheus_spark import chunks as chunks_mod

    utc = dt.timezone.utc
    # two series on node n0, one on n1; counters with one reset on s2
    def series(name, vals):
        return [
            (name, dt.datetime(2024, 1, 1, 0, 0, 10 * i, tzinfo=utc), float(v))
            for i, v in enumerate(vals)
        ]

    rows = (
        series("c{node=n0,id=s1}", [0, 10, 25])
        + series("c{node=n0,id=s2}", [100, 5, 30])  # reset at sample 2
        + series("c{node=n1,id=s3}", [7, 9, 11])
    )
    df = spark.createDataFrame(rows, "series_key string, ts timestamp, value double")
    root = str(tmp_path / "tsdb")
    chunks_mod.encode_chunks(df, series=("series_key",)).write.parquet(
        root + "/chunks"
    )
    got = {
        r["node"]: r["increase"]
        for r in Engine(spark, root).rate("5m", by=["node"]).collect()
    }
    # s1: 10+15=25; s2: reset -> 5 (from 0) + 25 = 30; s3: 2+2=4
    assert got == {"n0": 55.0, "n1": 4.0}


def test_range_query_avg_is_tier_merge_exact(engine):
    """avg through the 1d step must equal sum/count computed from the 5m
    tier directly — the tier merge carries exact partials (a naive
    avg-of-avgs would weight buckets wrongly)."""
    got = {
        (r["series_key"], r["bucket_ms"]): r["avg"]
        for r in engine.range_query("avg", step="1d").collect()
    }
    t5 = engine.tier("rollup_5m").groupBy(
        "series_key", (F.floor(F.col("bucket_ms") / 86_400_000) * 86_400_000)
        .cast("long").alias("bucket_ms")
    ).agg(
        (F.sum("sum_micro").cast("double") / F.sum("cnt").cast("double")).alias("avg")
    )
    want = {
        (r["series_key"], r["bucket_ms"]): r["avg"] for r in t5.collect()
    }
    assert got == want
