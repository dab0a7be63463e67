#!/usr/bin/env python
"""Chunk WRITE-path scaling (the Arrow/pandas-UDF side of the engine —
the rollup chain in scaling.py is pure JVM, so this measures the other
execution regime): shuffle -> sort -> DoD+Gorilla chunk encode at N and
4N cores, fresh JVM each, min of 3 passes. Appends to BENCH/BASELINE.md.

Knobs: SCALING_CHUNK_SAMPLES (default 30_000_000), SCALING_N (default 2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gfs_to_prometheus_spark import chunks
from gfs_to_prometheus_spark.session import get_spark
spark = get_spark(app="chunkscale", cpus={cpus})
df = spark.read.parquet({path!r})
n = df.count()
best = None
for _ in range(3):
    t0 = time.time()
    chunks.encode_chunks(df, series=("series_key",), ts="ts", value="value",
                         salt=4).write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cpus": {cpus}, "n_samples": n,
                   "seconds_min": round(best, 3),
                   "samples_per_sec": round(n / best, 1)}}))
"""


def materialize(n_samples: int, path: str) -> None:
    if os.path.isdir(path) and any(
        f.endswith("_SUCCESS") for f in os.listdir(path)
    ):
        return
    n_docs = max(1, n_samples // 32)  # ~32 samples/doc on average
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from gfs_to_prometheus_spark import synth
from gfs_to_prometheus_spark.session import get_spark
spark = get_spark(app="mat", cpus=32)
seq = synth.sequences(spark, {n_docs}, partitions=64)
samples = synth.samples_from_sequences(seq).select(
    "series_key", F.timestamp_millis(F.col("ts_ms")).alias("ts"), "value")
samples.write.mode("overwrite").parquet({path!r})
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def run(cpus: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO, cpus=cpus, path=path)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_samples = int(os.environ.get("SCALING_CHUNK_SAMPLES", "30000000"))
    n = int(os.environ.get("SCALING_N", "2"))
    path = f"/tmp/bench_chunk_samples_{n_samples}"
    materialize(n_samples, path)
    rN = run(n, path)
    r4N = run(4 * n, path)
    eff = (r4N["samples_per_sec"] / rN["samples_per_sec"]) / 4.0
    report = {
        f"local{n}": rN,
        f"local{4*n}": r4N,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    md = f"""

## Chunk write-path scaling (Arrow/pandas-UDF regime)

Same protocol over the TSDB write path (shuffle -> per-partition sort ->
DoD+Gorilla encode, salt=4, noop sink so only the engine is timed):

| parallelism | samples | wall (s) | samples/sec |
|---|---|---|---|
| local[{n}]  (N)  | {rN["n_samples"]:,} | {rN["seconds_min"]} | {rN["samples_per_sec"]:,} |
| local[{4*n}] (4N) | {r4N["n_samples"]:,} | {r4N["seconds_min"]} | {r4N["samples_per_sec"]:,} |

**Write-path scaling efficiency = {report["scaling_efficiency"]}.**
Each task encodes its own partition-local slice through its own Python
worker, so parallelism multiplies Arrow pipes as well as cores — the
regime a real cluster runs in.

Raw: `{json.dumps(report)}`
"""
    with open(os.path.join(HERE, "BASELINE.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
