"""Late / out-of-order data merge (SURVEY.md §7 hard-part d).

The reference's TSDB accepts samples up to 30 days late
(OutOfOrderTimeWindow, /root/reference/internal/tsdb/writer.go:32). In the
batch engine, a late sample must update every rollup tier that still holds
its bucket — even when the raw/chunk partition has already aged out
(retention.py drops raw earlier than the downsampled tiers).

Strategy (partition-local MERGE, never a full rewrite):
  1. Partials of the late samples per tier (5m/1h/1d) — tiny.
  2. For each affected day partition: read the existing tier rows,
     union with the late partials, rollup_merge at the SAME step —
     min/max/sum/count merge associatively; `last` resolves via the
     carried last_ts_ms, so a late sample older than the stored last
     never overwrites it.
  3. Dynamic partition overwrite of just those day partitions + a
     lineage row recording the merge.

On Iceberg this is a MERGE INTO against partition predicates; on the
sandbox parquet layout it is an overwrite of the affected `part=` dirs.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import checkpoint
from .rollup import rollup, rollup_merge

_TIER_STEPS = {"rollup_5m": 300, "rollup_1h": 3600, "rollup_1d": 86400}


def merge_late_samples(
    spark: SparkSession,
    out: str,
    late: DataFrame,
    series=("series_key",),
    job_id: str = "late_merge",
    ooo_window_days: int = 30,
    now_ms: int | None = None,
) -> dict[str, list[str]]:
    """Merge late samples (columns: series..., ts timestamp, value) into
    the tier tables under ``out``. Returns {table: [updated parts]}.
    Samples older than the out-of-order window are dropped (the
    reference's TSDB would likewise reject them)."""
    if now_ms is not None:
        horizon = now_ms - ooo_window_days * 86400_000
        late = late.filter(F.unix_millis(F.col("ts").cast("timestamp")) >= horizon)
    if late.isEmpty():
        return {}

    updated: dict[str, list[str]] = {}
    t0 = time.monotonic()
    partial_5m = rollup(late, 300, series=series)
    for table, step in _TIER_STEPS.items():
        partial = (
            partial_5m
            if step == 300
            else rollup_merge(partial_5m, step, series=series)
        ).withColumn(
            "part", F.date_format(F.timestamp_millis("bucket_ms"), "yyyy-MM-dd")
        )
        days = [r["part"] for r in partial.select("part").distinct().collect()]
        path = os.path.join(out, table)
        existing = spark.read.parquet(path).filter(F.col("part").isin(days))
        merged = rollup_merge(
            existing.unionByName(partial), step, series=series
        ).withColumn(
            "part", F.date_format(F.timestamp_millis("bucket_ms"), "yyyy-MM-dd")
        )
        # two-phase: the source partitions are being overwritten, so
        # stage the merge to disk before the write clobbers its input
        # (Iceberg's snapshot isolation makes this implicit; plain parquet
        # needs the explicit staging hop)
        staging = os.path.join(out, f"_staging_{table}")
        merged.write.mode("overwrite").parquet(staging)
        checkpoint.write_partitioned(spark.read.parquet(staging), out, table)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        stats = [
            (p, n, c)
            for p, n, c in checkpoint.partition_stats(
                spark.read.parquet(path).filter(F.col("part").isin(days))
            )
        ]
        checkpoint.append_lineage(
            spark, out, job_id, table, stats, int((time.monotonic() - t0) * 1000)
        )
        updated[table] = sorted(days)
    return updated
