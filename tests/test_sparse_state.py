"""Streaming change-point encoder: state carries the last sample across
micro-batches and restarts; output equals the batch sparse_encode of the
whole in-order input (the F6 equivalence law)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gfs_to_prometheus_spark import gapfill
from gfs_to_prometheus_spark.streaming import sparse_state

SCHEMA = "series_key string, ts_ms long, value double"


def _write_wave(spark, src, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, name))


def _run_once(spark, src, out, cp):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per wave
        .parquet(src + "/*")
    )

    def sink(batch, batch_id):
        if not batch.isEmpty():
            batch.write.mode("append").parquet(out)

    q = (
        sparse_state.sparse_encode_stream(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_equals_batch_sparse_encode(spark, tmp_path):
    src, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(src)

    w1 = [("a", 1000, 1.0), ("a", 2000, 1.0), ("b", 1000, 7.0)]
    w2 = [("a", 3000, 1.0), ("a", 4000, 2.0), ("b", 2000, 7.0)]
    _write_wave(spark, src, w1, "w1")
    _write_wave(spark, src, w2, "w2")
    _run_once(spark, src, out, cp)

    # restart with a third wave: repeat (suppressed) then change (emitted)
    w3 = [("a", 5000, 2.0), ("a", 6000, 3.0), ("b", 3000, 8.0)]
    _write_wave(spark, src, w3, "w3")
    _run_once(spark, src, out, cp)

    got = {
        (r["series_key"], r["ts_ms"], r["value"])
        for r in spark.read.parquet(out).collect()
    }
    batch_in = spark.createDataFrame(w1 + w2 + w3, SCHEMA).select(
        "series_key", F.timestamp_millis("ts_ms").alias("ts"), "value"
    )
    want = {
        (r["series_key"], r["ts_ms"], r["value"])
        for r in gapfill.sparse_encode(batch_in, series=("series_key",))
        .select(
            "series_key",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            "value",
        )
        .collect()
    }
    assert got == want
    assert ("a", 2000, 1.0) not in got  # repeats suppressed
    assert ("a", 4000, 2.0) in got and ("a", 6000, 3.0) in got


def test_stream_drops_late_samples(spark, tmp_path):
    src, out, cp = str(tmp_path / "in2"), str(tmp_path / "o2"), str(tmp_path / "cp2")
    os.makedirs(src)
    _write_wave(spark, src, [("a", 5000, 1.0)], "w1")
    _run_once(spark, src, out, cp)
    # a late sample (ts < state) must not emit even though its value differs
    _write_wave(spark, src, [("a", 1000, 9.0), ("a", 6000, 2.0)], "w2")
    _run_once(spark, src, out, cp)
    got = {
        (r["ts_ms"], r["value"]) for r in spark.read.parquet(out).collect()
    }
    assert got == {(5000, 1.0), (6000, 2.0)}


def test_multi_chunk_microbatch_orders_across_chunks(spark, tmp_path):
    """applyInPandasWithState delivers one group's micro-batch as multiple
    Arrow chunks with no cross-chunk ts ordering (ADVICE r3): with
    maxRecordsPerBatch=2 a 9-row out-of-order micro-batch splits into
    chunks whose later chunks hold EARLIER timestamps. Per-chunk scans
    would drop those as late; the whole-batch concat must not."""
    src, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(src)
    # one series, one wave, ts deliberately shuffled so arrow chunking
    # splits ties and out-of-order rows across chunk boundaries
    rows = [
        ("a", 7000, 4.0), ("a", 1000, 1.0), ("a", 5000, 3.0),
        ("a", 2000, 1.0), ("a", 6000, 3.0), ("a", 3000, 2.0),
        ("a", 4000, 2.0), ("a", 8000, 4.0), ("a", 8000, 9.0),  # tie -> max
    ]
    _write_wave(spark, src, rows, "w1")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        _run_once(spark, src, out, cp)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {
        (r["series_key"], r["ts_ms"]): r["value"]
        for r in spark.read.parquet(out).collect()
    }
    batch = gapfill.sparse_encode(
        spark.createDataFrame(rows, SCHEMA),
        series=("series_key",), ts="ts_ms",
    )
    want = {
        (r["series_key"], r["ts_ms"]): r["value"] for r in batch.collect()
    }
    assert got == want
