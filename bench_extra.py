#!/usr/bin/env python
"""Extra benchmarks for the optimization round (guide §1.4): noop-sink
isolation per query, compact-slice phase breakdown, and plan dumps.

NOT part of the driver contract — bench.py stays frozen. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--plans DIR]
        [--only name1,name2] [--phases] [--repeat N]

Prints one JSON line with per-query noop-sink seconds (min of N timed
passes after one warm pass) and, with --phases, the compact-slice phase
breakdown (setup encode / stats scan / cache+count / decode+encode compute
/ write+commit).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402  (frozen list; read-only import)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_noop(spark, fn, sf_dir: str, label: str, repeat: int) -> float:
    spark.sparkContext.setJobDescription(f"warm:{label}")
    noop(fn(spark, sf_dir))
    best = None
    for _ in range(repeat):
        spark.sparkContext.setJobDescription(f"timed:{label}")
        t0 = time.perf_counter()
        noop(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    spark.sparkContext.setJobDescription(None)
    return round(best, 4)


def compact_phases(spark, sf_dir: str) -> dict[str, float]:
    """bench.py's _timed_compact_slice split into phases (all timed)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from gfs_to_prometheus_spark import checkpoint, chunks as chunks_mod
    from jobs import compact as compact_job

    out: dict[str, float] = {}
    root = tempfile.mkdtemp(prefix="bx_compact_")
    try:
        t0 = time.perf_counter()
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        samples = ev.select(
            F.concat(
                "event_type", F.lit("|"), F.col("user_id").cast("string")
            ).alias("series_key"),
            "ts",
            "value",
        )
        ch = chunks_mod.encode_chunks(samples, series=("series_key",))
        ch.withColumn(
            "part",
            F.date_format(F.timestamp_millis("block_start_ms"), "yyyy-MM-dd"),
        ).write.mode("overwrite").parquet(os.path.join(root, "chunks"))
        out["setup_encode_2h"] = round(time.perf_counter() - t0, 4)

        src = spark.read.parquet(os.path.join(root, "chunks"))
        out["n_src_chunks"] = src.count()

        # phase: decode only (noop)
        spark.sparkContext.setJobDescription("bx:decode_only")
        t0 = time.perf_counter()
        noop(chunks_mod.decode_chunks(src, series=("series_key",)))
        out["decode_only_noop"] = round(time.perf_counter() - t0, 4)

        # phase: decode + re-encode at 1d + salt-repartition (noop, no write)
        spark.sparkContext.setJobDescription("bx:decode_encode_1d")
        t0 = time.perf_counter()
        samples2 = chunks_mod.decode_chunks(src, series=("series_key",)).select(
            "series_key", F.timestamp_millis("ts_ms").alias("ts"), "value"
        )
        recoded = chunks_mod.encode_chunks(
            samples2, series=("series_key",), block_s=86_400
        ).withColumn(
            "part",
            F.date_format(F.timestamp_millis("block_start_ms"), "yyyy-MM-dd"),
        )
        noop(recoded)
        out["decode_encode_1d_noop"] = round(time.perf_counter() - t0, 4)

        # phase: the full compact() as bench times it
        spark.sparkContext.setJobDescription("bx:compact_full")
        t0 = time.perf_counter()
        compact_job.compact(spark, root)
        out["compact_full"] = round(time.perf_counter() - t0, 4)
        out["n_dst_chunks"] = spark.read.parquet(
            os.path.join(root, "chunks_1d")
        ).count()
        spark.sparkContext.setJobDescription(None)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dump explain() to DIR")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    ap.add_argument("--phases", action="store_true")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from gfs_to_prometheus_spark.queries import QUERIES
    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app="bench_extra", cpus=cpus)
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    names = [n for n in HEADLINE if n in QUERIES]
    if args.only:
        names = [n for n in args.only.split(",") if n in QUERIES]

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)

    res: dict = {"sf_dir": sf_dir, "cpus": cpus}
    if not args.no_time:
        q: dict[str, float] = {}
        for name in names:
            q[name] = time_noop(spark, QUERIES[name], sf_dir, name, args.repeat)
        res["queries_noop"] = q
        res["total_noop"] = round(sum(q.values()), 4)
    if args.phases:
        res["compact_phases"] = compact_phases(spark, sf_dir)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
