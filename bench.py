#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

``value`` is total wall time of the headline set; per-query seconds under
"queries". Also reports rollup throughput (samples/sec) for the flagship
tier job under "samples_per_sec" (north_rule metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "rollup_5m",
    "rollup_1h_from_5m",
    "rollup_1d_from_1h",
    "counter_rate_5m",
    "topk5_users",
    "gapfill_locf_1h",
    "gapfill_linear_1h",
    "holt_winters_1h",
    "absent_over_time_1h",
    "p95_value_by_type",
    "tpch_q1",
    "chunk_roundtrip_salted",
    "revenue_by_region",
    "dedup_exact",
    # the CAPPED variant is the plan a 100 TB user runs (stop-shingle
    # max_df cap bounds the O(df^2) hot-shingle blow-up); the uncapped
    # exact baseline is timed separately under "extras"
    "ngram_jaccard_capped",
    "token_counts",
    "cosine_topk",
    # the SCALE paths a 100 TB user actually runs (vs the exact baselines
    # above): banded MinHash-LSH near-dup and IVF ANN
    "minhash_lsh_dups",
    "ivf_ann_topk",
]


def _timed_compact_slice(spark, data_dir: str, prefix: str) -> float:
    """Encode data_dir's events into a day-partitioned 2h chunk table
    (untimed setup), then time jobs/compact.py's full 2h -> 1d slice.
    ONE definition so the sf0.1 and sf1.0 numbers always measure the
    same protocol (their ratio is a headline metric)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from gfs_to_prometheus_spark import chunks as chunks_mod
    from jobs import compact as compact_job

    root = tempfile.mkdtemp(prefix=prefix)
    try:
        ev = spark.read.parquet(f"{data_dir}/events.parquet")
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
        t0 = time.perf_counter()
        compact_job.compact(spark, root)
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from gfs_to_prometheus_spark.queries import QUERIES
    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app="bench", cpus=cpus)

    # warm the JVM + file listing once so per-query numbers measure the
    # queries, not session startup
    n_samples = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # one untimed warm pass: whole-stage codegen compilation and page-cache
    # fills otherwise dominate the first execution of each plan shape
    # (measured 1.5-2x inflation on this host); timed numbers below are
    # steady-state
    for name in HEADLINE:
        if name in QUERIES:
            QUERIES[name](spark, sf_dir).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        # min of 2 timed passes: this host deschedules the VM for hundreds
        # of ms at a time, which otherwise swings single-pass numbers ~2x
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            # count() forces full execution of every operator in the plan
            QUERIES[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        per_query[name] = round(best, 4)
        total += best

    # write-amortization path: 2h -> 1d block compaction (jobs/compact.py).
    # Setup (encode + land the 2h chunk table) is untimed; the timed span
    # is the compaction job itself — decode, re-encode at 1d, committed
    # per-day with lineage, i.e. the full background-compactor slice.
    compact_dt = _timed_compact_slice(spark, sf_dir, "bench_compact_")
    per_query["compact_2h_to_1d"] = round(compact_dt, 4)
    total += compact_dt

    # non-headline data points (not in the total): the uncapped exact
    # jaccard baseline — quadratic in hot-shingle df by construction, so
    # HEADLINE tracks the capped scale path instead
    extras: dict[str, float] = {}
    for name in ("ngram_jaccard_pairs",):
        QUERIES[name](spark, sf_dir).count()  # warm
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        extras[name] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    QUERIES["rollup_5m"](spark, sf_dir).count()
    rollup_dt = time.perf_counter() - t0

    # ------------------------------------------------------------------
    # sf1.0: the same headline set at 10x rows (deterministic in-repo
    # scale-up, BENCH/make_sf1.py) — one warm + one timed pass per query,
    # plus per-row cost vs sf0.1: ratio = t_sf1 / (10 * t_sf0.1). At
    # sf0.1 fixed overheads dominate (~0.3 s floor), so healthy ratios
    # sit WELL below 1; anything > 1.3 is super-linear and flagged.
    # Disable with SPARK_GRAFT_SF1=0.
    # ------------------------------------------------------------------
    sf1: dict = {}
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and "sf0.1" in sf_dir:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
        )
        from make_sf1 import FACTOR, ensure_sf1

        sf1_dir = ensure_sf1(
            spark,
            sf_dir,
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".benchdata", "sf1.0"
            ),
        )
        n1 = spark.read.parquet(f"{sf1_dir}/events.parquet").count()
        q1: dict[str, float] = {}
        ratio: dict[str, float] = {}
        for name in HEADLINE:
            if name not in QUERIES:
                continue
            QUERIES[name](spark, sf1_dir).count()  # warm (codegen/listing)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf1_dir).count()
            q1[name] = round(time.perf_counter() - t0, 4)
            ratio[name] = round(q1[name] / (FACTOR * per_query[name]), 3)
        # compaction slice at sf1 (identical protocol: one shared helper)
        q1["compact_2h_to_1d"] = round(
            _timed_compact_slice(spark, sf1_dir, "bench_compact_sf1_"), 4
        )
        ratio["compact_2h_to_1d"] = round(
            q1["compact_2h_to_1d"] / (FACTOR * per_query["compact_2h_to_1d"]),
            3,
        )
        t0 = time.perf_counter()
        QUERIES["rollup_5m"](spark, sf1_dir).count()
        r1_dt = time.perf_counter() - t0
        sf1 = {
            "sf": 1.0,
            "n_samples": n1,
            "total": round(sum(q1.values()), 4),
            "queries": q1,
            "per_row_cost_ratio_vs_sf0.1": ratio,
            "superlinear": sorted(
                [k for k, v in ratio.items() if v > 1.3]
            ),
            "samples_per_sec": round(n1 / r1_dt, 1),
        }

    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 4),
                "unit": "sec",
                "queries": per_query,
                "extras": extras,
                "sf1": sf1,
                "sf": sf,
                "cpus": cpus,
                "n_samples": n_samples,
                "samples_per_sec": round(n_samples / rollup_dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
