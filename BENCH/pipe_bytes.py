#!/usr/bin/env python
"""Measure the bytes/row actually crossing the JVM->Python Arrow pipe
into the chunk-encode UDF — the write path's measured bottleneck.

Compares the round-3 projection (series, _ts_ms, _val, _block int64,
_salt int64) against the maximally-trimmed candidate (series, _salt
int32, _ts_ms, _val; _block recomputed python-side) by summing Arrow
RecordBatch.nbytes inside a mapInArrow pass over the SAME shuffled +
sorted input. The candidate saves 27% of pipe bytes but LOST the
end-to-end A/B (python-side rebuild cost > transfer savings), so the
shipped encoder keeps _block and takes only the free i32-salt cut —
this script records why the pipe-volume lever is considered exhausted.

Prints one JSON line and appends to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from scaling_chunks import materialize  # noqa: E402

N = int(os.environ.get("PIPE_SAMPLES", "5000000"))
SALT = 4
STEP_MS = 7200 * 1000


def measure(df) -> dict:
    """Sum Arrow batch bytes + rows crossing into a python UDF over df."""
    import pyarrow as pa

    def count(batches):
        rows = 0
        nbytes = 0
        for b in batches:
            rows += b.num_rows
            nbytes += b.nbytes
        yield pa.RecordBatch.from_pydict(
            {"rows": [rows], "nbytes": [nbytes]}
        )

    agg = df.mapInArrow(count, schema="rows long, nbytes long")
    from pyspark.sql import functions as F

    (r,) = agg.agg(F.sum("rows").alias("r"), F.sum("nbytes").alias("b")).collect()
    return {"rows": int(r["r"]), "bytes": int(r["b"]),
            "bytes_per_row": round(r["b"] / r["r"], 2)}


def main() -> None:
    from pyspark.sql import functions as F

    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app="pipe_bytes", cpus=8)
    path = f"/tmp/bench_chunk_samples_{N}"
    materialize(N, path)
    df = spark.read.parquet(path)
    base = df.select(
        "series_key",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("_ts_ms"),
        F.col("value").cast("double").alias("_val"),
    ).withColumn(
        "_block",
        (F.floor(F.col("_ts_ms") / F.lit(STEP_MS)) * STEP_MS).cast("long"),
    )
    keys = ["series_key", "_block", "_salt"]
    r3 = base.withColumn(
        "_salt", F.pmod(F.xxhash64("_ts_ms"), F.lit(SALT))
    )
    r3 = r3.repartition(*keys).sortWithinPartitions(*keys, "_ts_ms")
    r4 = base.withColumn(
        "_salt", F.pmod(F.xxhash64("_ts_ms"), F.lit(SALT)).cast("int")
    )
    r4 = (
        r4.repartition(*keys)
        .sortWithinPartitions(*keys, "_ts_ms")
        .select("series_key", "_salt", "_ts_ms", "_val")
    )
    m3 = measure(r3)
    m4 = measure(r4)
    saved = round(1 - m4["bytes"] / m3["bytes"], 4)
    report = {"r3_projection": m3, "r4_projection": m4, "bytes_saved": saved}
    print(json.dumps(report))
    md = f"""

### Arrow pipe volume into the encode UDF (BENCH/pipe_bytes.py)

| projection | bytes/row | total bytes ({m3["rows"]:,} rows) |
|---|---|---|
| r3 (ships _block i64 + _salt i64) | {m3["bytes_per_row"]} | {m3["bytes"]:,} |
| r4 (block recomputed, salt i32) | {m4["bytes_per_row"]} | {m4["bytes"]:,} |

**{saved:.1%} fewer bytes would cross the JVM->Python boundary** — but
the end-to-end A/B (see narrative above this table in BASELINE.md)
measured the trimmed projection slower: the python-side _block rebuild
costs more than the pipe saves, so the shipped encoder keeps _block and
shrinks only the salt to i32. The pipe-volume lever is exhausted by
measurement, not argument.

Raw: `{json.dumps(report)}`
"""
    with open(os.path.join(HERE, "BASELINE.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
