"""Streaming rollup tier: the stream==batch law — latest emitted row per
(series, bucket) over any micro-batch split (including across a query
restart) equals rollup.rollup of the whole input."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gfs_to_prometheus_spark.rollup import rollup
from gfs_to_prometheus_spark.streaming import rollup_state

SCHEMA = "series_key string, ts_ms long, value double"


def _write_wave(spark, src, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, name))


def _run_once(spark, src, out, cp, step_s=300):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per wave
        .parquet(src + "/*")
    )

    def sink(batch, batch_id):
        if not batch.isEmpty():
            batch.withColumn("_b", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out)

    q = (
        rollup_state.rollup_stream(stream, step_s)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _latest(spark, out):
    """Upsert semantics: the newest emitted row per (series, bucket)."""
    df = spark.read.parquet(out)
    return (
        df.groupBy("series_key", "bucket_ms")
        .agg(
            F.max_by(
                F.struct(
                    "vmin", "vmax", "sum_micro", "cnt", "last", "last_ts_ms"
                ),
                "_b",
            ).alias("s")
        )
        .select("series_key", "bucket_ms", "s.*")
    )


def test_stream_rollup_equals_batch_with_restart(spark, tmp_path):
    src, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(src)
    # two series; bucket 0 [0, 300000) and bucket 1 [300000, 600000);
    # waves split buckets across micro-batches so state merges partials
    w1 = [("a", 10_000, 3.5), ("a", 20_000, 1.25), ("b", 15_000, -2.0)]
    w2 = [("a", 290_000, 9.0), ("a", 310_000, 4.0), ("b", 16_000, 0.5)]
    _write_wave(spark, src, w1, "w1")
    _write_wave(spark, src, w2, "w2")
    _run_once(spark, src, out, cp)

    # restart: same checkpoint, a third wave touching existing buckets
    w3 = [("a", 25_000, 7.75), ("b", 590_000, 6.0)]
    _write_wave(spark, src, w3, "w3")
    _run_once(spark, src, out, cp)

    got = {
        (r["series_key"], r["bucket_ms"]): (
            r["vmin"], r["vmax"], r["sum_micro"], r["cnt"],
            r["last"], r["last_ts_ms"],
        )
        for r in _latest(spark, out).collect()
    }
    allrows = w1 + w2 + w3
    batch = rollup(
        spark.createDataFrame(allrows, SCHEMA).select(
            "series_key",
            F.timestamp_millis("ts_ms").alias("ts"),
            "value",
        ),
        300,
        series=("series_key",),
    )
    want = {
        (r["series_key"], r["bucket_ms"]): (
            r["vmin"], r["vmax"], r["sum_micro"], r["cnt"],
            r["last"], r["last_ts_ms"],
        )
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 4  # a:[b0,b1], b:[b0,b1]


def test_stream_rollup_multi_chunk_batch(spark, tmp_path):
    """Arrow-chunked micro-batch (maxRecordsPerBatch=2): `last` needs the
    batch-global ts argmax, not a per-chunk one."""
    src, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(src)
    rows = [
        ("a", 50_000, 5.0), ("a", 10_000, 1.0), ("a", 40_000, 4.0),
        ("a", 20_000, 2.0), ("a", 30_000, 3.0),
    ]
    _write_wave(spark, src, rows, "w1")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        _run_once(spark, src, out, cp)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    rows_out = _latest(spark, out).collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert (r["last"], r["last_ts_ms"]) == (5.0, 50_000)
    assert (r["vmin"], r["vmax"], r["cnt"]) == (1.0, 5.0, 5)
    assert r["sum_micro"] == 15_000_000


def test_watermark_bounds_state_and_drops_stragglers(spark, tmp_path):
    """With watermark_delay, a sample older than the watermark is DROPPED
    (the Prometheus out-of-order policy: route it through the batch MERGE
    path) and the closed bucket's state is evicted instead of growing
    forever — so the final tier equals the batch rollup of the on-time
    waves only, and the straggler never partially re-opens its bucket."""
    src, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(src)
    w1 = [("a", 10_000, 1.0), ("a", 20_000, 3.0)]        # bucket 0
    w2 = [("a", 4_000_000, 5.0)]                         # far ahead: watermark
    w3 = [("a", 30_000, 99.0)]                           # straggler for bucket 0
    for i, w in enumerate((w1, w2, w3)):
        _write_wave(spark, src, w, f"w{i}")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )

    def sink(batch, batch_id):
        if not batch.isEmpty():
            batch.withColumn("_b", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out)

    q = (
        rollup_state.rollup_stream(stream, 300, watermark_delay="1 minute")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["series_key"], r["bucket_ms"]): (r["sum_micro"], r["cnt"], r["last"])
        for r in _latest(spark, out).collect()
    }
    batch = rollup(
        spark.createDataFrame(w1 + w2, SCHEMA).select(
            "series_key", F.timestamp_millis("ts_ms").alias("ts"), "value"
        ),
        300,
        series=("series_key",),
    )
    want = {
        (r["series_key"], r["bucket_ms"]): (r["sum_micro"], r["cnt"], r["last"])
        for r in batch.collect()
    }
    assert got == want  # w3's straggler contributed nothing
