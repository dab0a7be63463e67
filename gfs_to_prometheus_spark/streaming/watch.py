"""Watch-mode: the Structured Streaming analog of the reference's fsnotify
watcher (SURVEY.md §2.9, /root/reference/internal/watcher/watcher.go:48-90
and internal/cluster/watcher.go:33-139).

Mapping:
  ST1 fsnotify dir watch      -> streaming file source (discovery built in)
  ST2 extension/pattern filter-> pathGlobFilter on the source
  ST3 once-only sync.Map      -> checkpointed source offsets (exactly-once
                                 per file, durable across restarts — the
                                 reference loses its dedup set on restart)
  ST4 goroutine per file      -> micro-batch task parallelism
  ST5 30d out-of-order window -> withWatermark('ts', '30 days')
  ST6 2h block cut            -> tumbling window(ts, '2 hours')

``foreachBatch`` reuses the exact batch rollup/chunk transforms, so the
streaming path cannot drift from the batch path (single definition of
semantics — unlike the reference, which maintains two parsers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..rollup import rollup


def watch_samples(
    spark: SparkSession,
    in_dir: str,
    schema: str,
    glob: str = "*.parquet",
) -> DataFrame:
    """ST1+ST2: a streaming DataFrame over files appearing under in_dir."""
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )


def start_rollup_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "event_type string, ts timestamp, value double",
    step_s: int = 300,
    series=("event_type",),
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous 5m rollup ingestion with exactly-once file processing.

    foreachBatch appends per-batch PARTIAL rollups; readers merge partials
    with rollup_merge (associative), so late/duplicate-window batches never
    corrupt totals — the MERGE-for-late-partitions pattern from SURVEY §7.
    """
    stream = watch_samples(spark, in_dir, schema)

    def process(batch: DataFrame, batch_id: int) -> None:  # ST4: per batch
        if batch.isEmpty():
            return
        (
            rollup(batch, step_s, series=series)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)  # ST3 once-only
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts_with_watermark(
    stream: DataFrame,
    ts: str = "ts",
    step: str = "2 hours",
    watermark: str = "30 days",
    series=("event_type",),
) -> DataFrame:
    """ST5+ST6: stateful windowed aggregation tolerating 30d-late data
    (the TSDB OutOfOrderTimeWindow analog,
    /root/reference/internal/tsdb/writer.go:32)."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, step), *series)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
