"""Watch-mode streaming: exactly-once per file across restarts (ST3),
late-data windowed aggregation (ST5/ST6)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gfs_to_prometheus_spark.rollup import rollup_merge
from gfs_to_prometheus_spark.streaming import watch

SCHEMA = "event_type string, ts timestamp, value double"


def _write_wave(spark, src, events, name):
    from datetime import datetime

    rows = [
        (t, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), v) for t, ts, v in events
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, name))


def test_stream_exactly_once_across_restarts(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(src)

    wave1 = [("a", "2024-01-01 00:00:05", 1.0), ("a", "2024-01-01 00:01:05", 2.0)]
    wave2 = [("a", "2024-01-01 00:02:05", 3.0), ("b", "2024-01-01 00:00:30", 5.0)]

    _write_wave(spark, src, wave1, "w1")
    q = watch.start_rollup_stream(spark, src + "/*", out, cp, available_now=True)
    q.awaitTermination(120)

    _write_wave(spark, src, wave2, "w2")
    q = watch.start_rollup_stream(spark, src + "/*", out, cp, available_now=True)
    q.awaitTermination(120)

    partials = spark.read.parquet(out)
    # two batches may produce two partial rows for the same (series,bucket);
    # rollup_merge folds them and MUST equal a batch rollup of all input
    merged = rollup_merge(partials.drop("_batch_id"), 300, series=("event_type",))
    got = {
        (r["event_type"], r["bucket_ms"]): (r["cnt"], r["sum_micro"])
        for r in merged.collect()
    }
    b0 = 1704067200000
    assert got[("a", b0)] == (3, 6_000_000)  # wave1(2) + wave2(1), no dupes
    assert got[("b", b0)] == (1, 5_000_000)

    # restart with same checkpoint and no new files -> nothing reprocessed
    before = partials.count()
    q = watch.start_rollup_stream(spark, src + "/*", out, cp, available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == before


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "in2")
    os.makedirs(src)
    rows = [
        ("a", "2024-01-01 00:30:00", 1.0),
        ("a", "2024-01-01 01:30:00", 2.0),
        ("a", "2024-01-01 02:30:00", 7.0),  # next 2h block
    ]
    _write_wave(spark, src, rows, "w")
    stream = watch.watch_samples(spark, src + "/*", SCHEMA)
    agg = watch.windowed_counts_with_watermark(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"].start.isoformat(), r["event_type"]): (r["cnt"], r["vmax"])
        for r in spark.sql("select * from wm_counts").collect()
    }
    assert got[("2024-01-01T00:00:00", "a")] == (2, 2.0)
    assert got[("2024-01-01T02:00:00", "a")] == (1, 7.0)
