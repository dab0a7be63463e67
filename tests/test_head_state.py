"""Stateful streaming head (applyInPandasWithState): state accumulates
across micro-batches AND across query restarts via the checkpoint."""

from __future__ import annotations

import os

from gfs_to_prometheus_spark.streaming import head_state

SCHEMA = "series_key string, ts_ms long, value double"


def _write_wave(spark, src, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, name))


def _run_once(spark, src, out, cp):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src + "/*")
    )
    def sink(batch, batch_id):
        if not batch.isEmpty():
            batch.write.mode("append").parquet(out)

    q = (
        head_state.head_updates(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_head_state_across_batches_and_restarts(spark, tmp_path):
    src, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(src)

    _write_wave(spark, src, [("a", 1000, 1.0), ("b", 1000, 5.0)], "w1")
    _write_wave(spark, src, [("a", 3000, 3.0)], "w2")
    _run_once(spark, src, out, cp)

    latest = {
        r["series_key"]: r
        for r in spark.read.parquet(out)
        .orderBy("n_seen")
        .collect()
        if True
    }
    # after both waves: a has seen 2 samples, last=(3000, 3.0)
    assert latest["a"]["n_seen"] == 2
    assert latest["a"]["last_ts_ms"] == 3000 and latest["a"]["last_value"] == 3.0
    assert latest["b"]["n_seen"] == 1 and latest["b"]["last_value"] == 5.0

    # restart with a new file, including a LATE sample for 'a' (ts=2000):
    # aggregates grow, `last` must NOT regress
    _write_wave(spark, src, [("a", 2000, 9.9)], "w3")
    _run_once(spark, src, out, cp)
    rows = [
        r
        for r in spark.read.parquet(out).collect()
        if r["series_key"] == "a" and r["n_seen"] == 3
    ]
    assert rows, "state did not survive the restart"
    assert rows[0]["last_ts_ms"] == 3000 and rows[0]["last_value"] == 3.0
    assert rows[0]["sum_micro"] == 1_000_000 + 3_000_000 + 9_900_000
