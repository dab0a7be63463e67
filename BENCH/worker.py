#!/usr/bin/env python
"""One scaling-run worker: run the 5m->1h->1d rollup chain over a
pre-materialized samples parquet (the engine's real input path — the
reference likewise reads existing archives) and print one JSON line.

Run in a fresh process per parallelism level (a JVM can't change master):
    python BENCH/worker.py --cpus 8 --input /tmp/bench_samples
Reports the MIN of --runs measured passes (robust to host interference)
after one warm pass (JIT/codegen at full data volume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from gfs_to_prometheus_spark.rollup import rollup, rollup_merge
    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app=f"scaling_{args.cpus}", cpus=args.cpus)
    # size scan splits so the scan stage has ~4 tasks per core at 4N —
    # a 128 MB default would starve wide runs on a ~1-4 GB input
    total_bytes = sum(
        os.path.getsize(os.path.join(args.input, f))
        for f in os.listdir(args.input)
        if f.endswith(".parquet")
    )
    split = max(total_bytes // (args.cpus * 4), 8 * 1024 * 1024)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    samples = spark.read.parquet(args.input)

    def chain() -> int:
        t5 = rollup(samples, 300, series=("series_key",))
        t1h = rollup_merge(t5, 3600, series=("series_key",))
        return rollup_merge(t1h, 86400, series=("series_key",)).count()

    chain()  # warm pass at full volume
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        n_points = chain()
        times.append(time.perf_counter() - t0)

    n_samples = samples.count()
    dt = min(times)
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "n_samples": n_samples,
                "rollup_points_1d": n_points,
                "seconds_min": round(dt, 3),
                "seconds_all": [round(t, 2) for t in times],
                "samples_per_sec": round(n_samples / dt, 1),
                "scan_split_mb": round(split / 1e6, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
