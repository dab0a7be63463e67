#!/usr/bin/env python
"""Chunk WRITE-path scaling in MULTI-PROCESS mode: the same shuffle ->
sort -> DoD+Gorilla encode workload as scaling_chunks.py, but run on
``local-cluster[E,c,m]`` masters — E separate executor JVMs, each with
its OWN Python workers and Arrow pipes — instead of one shared JVM.

Why: the in-JVM local[k] ladder measured 0.61-0.74 write-path efficiency
and attributed the gap to a shared-process ceiling (one JVM heap, one
aggregate Arrow pipe). A real cluster runs one JVM + one set of Python
workers PER EXECUTOR. local-cluster is the closest single-host stand-in:
if efficiency recovers when executors are separate processes, the plan
scales and the ceiling was the shared process, not the shuffle/encode
design.

Ladder: local-cluster[1,c,m] (N = c cores, one executor) vs
local-cluster[4,c,m] (4N cores across 4 executor processes). Fresh
driver process per level, min of 3 passes. Appends to BENCH/BASELINE.md.

Knobs: SCALING_CHUNK_SAMPLES (default 30_000_000), SCALING_EXEC_CORES
(default 4), SCALING_EXEC_MEM_MB (default 8192).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

from scaling_chunks import materialize  # noqa: E402  (same fixture)

WORKER = """
import json, os, sys, time
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from gfs_to_prometheus_spark import chunks

total_cores = {execs} * {cores}
spark = (
    SparkSession.builder.master("local-cluster[{execs},{cores},{mem}]")
    .appName("chunkscale_lc")
    .config("spark.pyspark.python", sys.executable)
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    .config("spark.sql.shuffle.partitions", str(2 * total_cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")
path = {path!r}
total_bytes = sum(
    os.path.getsize(os.path.join(path, f))
    for f in os.listdir(path) if f.endswith(".parquet")
)
split = max(total_bytes // (total_cores * 4), 8 * 1024 * 1024)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
df = spark.read.parquet(path)
n = df.count()
best = None
for _ in range(3):
    t0 = time.time()
    chunks.encode_chunks(df, series=("series_key",), ts="ts", value="value",
                         salt=4).write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"executors": {execs}, "cores_each": {cores},
                   "total_cores": total_cores, "n_samples": n,
                   "seconds_min": round(best, 3),
                   "samples_per_sec": round(n / best, 1)}}))
"""


def run(execs: int, cores: int, mem_mb: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c",
         WORKER.format(repo=REPO, execs=execs, cores=cores, mem=mem_mb, path=path)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_samples = int(os.environ.get("SCALING_CHUNK_SAMPLES", "30000000"))
    cores = int(os.environ.get("SCALING_EXEC_CORES", "4"))
    mem_mb = int(os.environ.get("SCALING_EXEC_MEM_MB", "8192"))
    path = f"/tmp/bench_chunk_samples_{n_samples}"
    materialize(n_samples, path)
    # isoefficiency curve below the host's ~8-core memory-bandwidth knee:
    # 1 -> 2 -> 4 executor processes at fixed cores-per-executor
    rs = {e: run(e, cores, mem_mb, path) for e in (1, 2, 4)}
    base_tp = rs[1]["samples_per_sec"]
    eff = {
        e: round((rs[e]["samples_per_sec"] / base_tp) / e, 3) for e in (2, 4)
    }
    report = {
        **{f"local-cluster[{e}]": rs[e] for e in rs},
        "eff_1_to_2": eff[2],
        "eff_1_to_4": eff[4],
        "scaling_efficiency": eff[4],
    }
    print(json.dumps(report))
    rows = "\n".join(
        f"| {e}N = {rs[e]['total_cores']} cores | {e} x {cores} | "
        f"{rs[e]['n_samples']:,} | {rs[e]['seconds_min']} | "
        f"{rs[e]['samples_per_sec']:,} | "
        f"{'—' if e == 1 else eff[e]} |"
        for e in (1, 2, 4)
    )
    md = f"""

## Chunk write-path scaling — multi-process (local-cluster) ladder

Same workload as the in-JVM ladder above, but with SEPARATE executor
JVMs (each with its own Python workers + Arrow pipes), the regime a real
cluster runs in:

| parallelism | executors x cores | samples | wall (s) | samples/sec | eff vs 1 exec |
|---|---|---|---|---|---|
{rows}

**Multi-process write-path scaling efficiency (1 -> 4 executors) =
{report["scaling_efficiency"]}** (1 -> 2: {eff[2]}).

Raw: `{json.dumps(report)}`
"""
    with open(os.path.join(HERE, "BASELINE.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
