"""End-to-end resumable pipeline job (spark-submit entrypoint).

    spark-submit --py-files gfs_to_prometheus_spark.zip jobs/pipeline.py \
        --out /data/tsdb --n-docs 100000 [--job-id run1] [--days-limit N]

Mirrors the reference's convert lifecycle (SURVEY.md §3.1/3.2):
read/derive samples -> validity filters -> rollup tiers 5m/1h/1d ->
chunk encode -> partitioned write, committed per day-partition with
lineage + counter metrics (checkpoint.py), resumable after a kill.

The fan-out story replaces the reference's goroutine semaphore
(/root/reference/internal/cluster/processor.go:98-128): partitions ARE
the concurrency unit; the shared-TSDB-writer bottleneck (and its
close-once bug, cluster/converter.go:72) disappears because every task
writes its own files and the partition commit coordinates.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from gfs_to_prometheus_spark import checkpoint, chunks, synth
from gfs_to_prometheus_spark.naming import valid_instance, valid_value
from gfs_to_prometheus_spark.rollup import rollup, rollup_merge

SERIES = ("series_key",)


def reject_reason(
    series_col: str = "series_key", value: str = "value"
) -> F.Column:
    """PERMISSIVE-with-metrics validation (SURVEY §4): NULL for valid rows,
    else the first failing rule's tag — F5 value sanity (NaN/Inf/|v|>1e15,
    AllStatsExtractor.java:83-85), then F2 series validity (length 1..200,
    >=80% printable, converter.go:148-163). Rows are never silently lost:
    the pipeline counts each reason per partition into the `rejects` table
    so input = written + rejected always reconciles."""
    v = F.col(value)
    s = F.col(series_col)
    return (
        F.when(v.isNull() | ~valid_value(v), F.lit("value_sanity"))
        .when(s.isNull() | ~valid_instance(s), F.lit("invalid_series"))
        .otherwise(F.lit(None).cast("string"))
    )


def build_samples(spark: SparkSession, n_docs: int) -> DataFrame:
    seq = synth.sequences(spark, n_docs)
    s = synth.samples_from_sequences(seq)
    # dedupe ties (series, ts) deterministically, add day partition + ts
    return (
        s.groupBy("series_key", "ts_ms")
        .agg(F.max("value").alias("value"))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withColumn("part", F.date_format(F.col("ts"), "yyyy-MM-dd"))
    )


def run(
    spark: SparkSession,
    out: str,
    n_docs: int = 10_000,
    job_id: str = "job",
    days_limit: int | None = None,
    salt: int = 4,
) -> dict[str, int]:
    """Synthesize + process (see run_from_samples)."""
    return run_from_samples(
        spark, out, build_samples(spark, n_docs), job_id, days_limit, salt
    )


def run_from_samples(
    spark: SparkSession,
    out: str,
    samples: DataFrame,
    job_id: str = "job",
    days_limit: int | None = None,
    salt: int = 4,
) -> dict[str, int]:
    """Process every not-yet-committed day partition; returns rows written
    per table. Calling again after a crash (or with a higher days_limit)
    completes the remainder; output is identical to one uninterrupted run.
    ``samples`` needs columns series_key, ts, value, part."""

    all_days = sorted(
        r["part"] for r in samples.select("part").distinct().collect()
    )
    if days_limit is not None:
        all_days = all_days[:days_limit]
    # resume marker = the LAST table in the commit chain: a day counted as
    # done only when the full chain committed; partially-committed days are
    # safely rewritten (dynamic partition overwrite is idempotent)
    done = checkpoint.completed_parts(spark, out, "chunks")
    todo = [d for d in all_days if d not in done]
    if not todo:
        return {}
    tagged = samples.filter(F.col("part").isin(todo)).withColumn(
        "_reject", reject_reason()
    )
    # cache the tagged slice: rejects agg + every tier + chunks read it
    tagged.cache()
    day_samples = tagged.filter(F.col("_reject").isNull()).drop("_reject")

    written: dict[str, int] = {}
    t0 = time.monotonic()

    # rejected-row counters, committed like data (dynamic partition
    # overwrite -> reprocessing a day replaces its counts, never doubles)
    rej = (
        tagged.filter(F.col("_reject").isNotNull())
        .groupBy("part", F.col("_reject").alias("reason"))
        .agg(F.count(F.lit(1)).alias("rows"))
    )
    rej_rows = rej.collect()  # tiny: one row per (day, reason)
    written["rejected"] = int(sum(r["rows"] for r in rej_rows))
    if rej_rows:
        checkpoint.write_partitioned(rej, out, "rejects")
        per_part: dict[str, int] = {}
        for r in rej_rows:
            per_part[r["part"]] = per_part.get(r["part"], 0) + r["rows"]
        checkpoint.append_lineage(
            spark, out, job_id, "rejects",
            [(p, n, 0) for p, n in sorted(per_part.items())],
            int((time.monotonic() - t0) * 1000),
        )

    t5 = rollup(day_samples, 300, series=SERIES).withColumn(
        "part", F.date_format(F.timestamp_millis("bucket_ms"), "yyyy-MM-dd")
    )
    # keep t5 cached: the 1h tier merges from it
    written["rollup_5m"] = _commit(
        spark, out, job_id, "rollup_5m", t5, t0, keep_cache=True
    )

    t1h = rollup_merge(t5, 3600, series=SERIES).withColumn(
        "part", F.date_format(F.timestamp_millis("bucket_ms"), "yyyy-MM-dd")
    )
    written["rollup_1h"] = _commit(
        spark, out, job_id, "rollup_1h", t1h, t0, keep_cache=True
    )

    t1d = rollup_merge(t1h.drop("part"), 86400, series=SERIES).withColumn(
        "part", F.date_format(F.timestamp_millis("bucket_ms"), "yyyy-MM-dd")
    )
    written["rollup_1d"] = _commit(spark, out, job_id, "rollup_1d", t1d, t0)
    t1h.unpersist()

    ch = chunks.encode_chunks(
        day_samples, series=SERIES, ts="ts", value="value", salt=salt
    ).withColumn(
        "part", F.date_format(F.timestamp_millis("block_start_ms"), "yyyy-MM-dd")
    )
    written["chunks"] = _commit(spark, out, job_id, "chunks", ch, t0)

    # a day whose rows were ALL rejected produces no chunk partition; mark
    # it complete anyway (rows=0) or resume would reprocess it forever
    done_now = checkpoint.completed_parts(spark, out, "chunks")
    empty_days = [d for d in todo if d not in done_now]
    if empty_days:
        checkpoint.append_lineage(
            spark, out, job_id, "chunks",
            [(d, 0, 0) for d in empty_days],
            int((time.monotonic() - t0) * 1000),
        )

    t5.unpersist()
    tagged.unpersist()
    return written


def _commit(
    spark: SparkSession,
    out: str,
    job_id: str,
    table: str,
    df: DataFrame,
    t0: float,
    keep_cache: bool = False,
    verify: bool = False,
) -> int:
    """Cache -> one-pass partition stats -> write -> lineage append.

    Stats come from the cached pre-write DataFrame, NOT a read-back of the
    written parquet: the read-back doubled write-path I/O (a full extra
    scan of every output table per commit — at 100 TB that halves write
    throughput) and stamped lineage rows for partitions committed by
    EARLIER runs. ``verify=True`` re-reads the table and checks the disk
    stats of the just-written partitions against the in-memory stats (an
    optional durability audit, off in the hot path). Returns rows written.
    """
    df.cache()
    stats = checkpoint.partition_stats(df)  # materializes the cache
    checkpoint.write_partitioned(df, out, table)  # served from cache
    if not keep_cache:
        df.unpersist()
    if verify:
        path = os.path.join(out, table)
        want = {p: (n, c) for p, n, c in stats}
        try:
            disk = {
                p: (n, c)
                for p, n, c in checkpoint.partition_stats(
                    spark.read.parquet(path)
                )
                if p in want
            }
        except AnalysisException:  # nothing written: dir absent
            disk = {}
        if disk != want:
            raise RuntimeError(
                f"post-write verify failed for {table}: {disk} != {want}"
            )
    checkpoint.append_lineage(
        spark, out, job_id, table, stats, int((time.monotonic() - t0) * 1000)
    )
    return int(sum(n for _, n, _ in stats))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=10_000)
    ap.add_argument("--job-id", default="job")
    ap.add_argument("--days-limit", type=int, default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app="pipeline", cpus=args.cpus)
    written = run(
        spark, args.out, args.n_docs, args.job_id, args.days_limit
    )
    print({"written": written})


if __name__ == "__main__":
    main()
