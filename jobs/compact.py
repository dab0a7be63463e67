"""TSDB block compaction job (spark-submit entrypoint).

    spark-submit jobs/compact.py --root /data/tsdb [--block-s 86400]

The reference writes through the Prometheus TSDB library, which compacts
2h head blocks into progressively larger blocks in the background
(prometheus/tsdb compactor; our sink's 2h blocks mirror its head-block
granularity — see chunks.py W3). On a table-backed sink the same
operation is a per-partition rewrite: decode every chunk of a day,
re-encode at the larger block size, overwrite the day atomically.

Properties:
* lossless — decode(compacted) == decode(source), proven by fingerprint
  in tests and by the lineage checksum on every commit;
* resumable/idempotent — same per-partition lineage protocol as the
  pipeline (dynamic partition overwrite + commit marker per day);
* fewer, larger row groups per day — the small-file/small-chunk problem
  at 100 TB is exactly what block compaction exists to fix (12x fewer
  chunk rows for a fully-sampled series at 2h -> 1d).

Daily blocks align with day partitions (86400s divides the partition),
so compaction never crosses a partition boundary — each day rewrites
independently, embarrassingly parallel across the cluster.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from gfs_to_prometheus_spark import checkpoint, chunks

SERIES = ("series_key",)


def compact(
    spark: SparkSession,
    root: str,
    src_table: str = "chunks",
    dst_table: str = "chunks_1d",
    block_s: int = 86_400,
    job_id: str = "compact",
    salt: int = 1,
) -> dict[str, int]:
    """Compact src_table's blocks into block_s-sized blocks in dst_table.
    Returns {"src_chunks": n, "dst_chunks": m, "samples": k} for the days
    compacted this run ({} when everything is already committed)."""
    # The block must DIVIDE the day, not just align with it: a multi-day
    # block (e.g. 604800s) would land all covered days' samples in the
    # block-start day's partition while lineage marks only that day done —
    # every re-run would re-encode a PARTIAL block and dynamic partition
    # overwrite would replace full data with partial data (silent loss).
    if 86_400_000 % (block_s * 1000) != 0:
        raise ValueError(
            f"block_s={block_s} must divide a day (86400): multi-day blocks "
            "would cross day partitions and break per-day lineage/resume"
        )
    from jobs.pipeline import _commit

    src_path = os.path.join(root, src_table)
    src = spark.read.parquet(src_path)
    done = checkpoint.completed_parts(spark, root, dst_table)
    all_days = sorted(
        str(r["part"]) for r in src.select("part").distinct().collect()
    )
    todo = [d for d in all_days if d not in done]
    if not todo:
        return {}
    sel = src.filter(F.col("part").cast("string").isin(todo))
    sel.cache()
    src_chunks = sel.count()
    samples = chunks.decode_chunks(sel, series=SERIES).select(
        *SERIES, F.timestamp_millis("ts_ms").alias("ts"), "value"
    )
    recoded = chunks.encode_chunks(
        samples, series=SERIES, ts="ts", value="value", block_s=block_s,
        salt=salt,
    ).withColumn(
        "part", F.date_format(F.timestamp_millis("block_start_ms"), "yyyy-MM-dd")
    )
    # One output file per day, not one per (day x shuffle partition):
    # compaction's whole point is fewer, larger files, but dynamic
    # partition overwrite writes a file per task per touched day —
    # measured ~1900 tiny files (and 7s of commit wall) for a 30-day
    # sf0.1 table without this. A day of chunk ROWS is already ~1/4000
    # of its samples, so one task per day is comfortable; for truly
    # massive days raise parallelism with repartition(n, "part").
    recoded = recoded.repartition("part")
    t0 = time.monotonic()
    dst_chunks = _commit(spark, root, job_id, dst_table, recoded, t0)
    n_samples = int(
        sel.agg(F.sum("n")).collect()[0][0] or 0
    )
    sel.unpersist()
    return {
        "src_chunks": int(src_chunks),
        "dst_chunks": int(dst_chunks),
        "samples": n_samples,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--src-table", default="chunks")
    ap.add_argument("--dst-table", default="chunks_1d")
    ap.add_argument("--block-s", type=int, default=86_400)
    ap.add_argument("--job-id", default="compact")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app="compact", cpus=args.cpus)
    print(
        {
            "compacted": compact(
                spark, args.root, args.src_table, args.dst_table,
                args.block_s, args.job_id,
            )
        }
    )


if __name__ == "__main__":
    main()
