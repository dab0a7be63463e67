"""`convert` entrypoint — the analog of the reference's
`gfs-to-prometheus convert [gfs files...] --tsdb-path D --config C`
(/root/reference/cmd/convert.go).

    spark-submit --py-files gfs_to_prometheus_spark.zip jobs/convert.py \
        --archives '/data/archives/*.parquet' --out /data/tsdb \
        [--config mappings.yaml] [--job-id run1]

Reads wire-format archive records (sources/gfs_binary), decodes the
sample streams, optionally applies the YAML metric-mapping config
(rename / labels / drop / include / exclude) when the series key carries
a "ResourceType.statName" shape, and runs the resumable tier+chunk
pipeline into --out.

Value semantics: samples are float64 gauges — the same storage type the
reference writes to Prometheus (TSDB samples are float64). value_long is
micro-scaled on the wire; the /1e6 conversion is exact for
|value_long| < 2^52 (values below ~4.5e9); beyond that, precision follows
float64 like any Prometheus ingestion would.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from gfs_to_prometheus_spark import config as config_mod, mapping
from gfs_to_prometheus_spark.sources import gfs_binary
from jobs.pipeline import run_from_samples


def convert(
    spark: SparkSession,
    archives: str | list[str],
    out: str,
    config_path: str | None = None,
    job_id: str = "convert",
    salt: int = 2,
) -> dict[str, int]:
    """Archive records -> decoded samples [-> config remap] -> pipeline."""
    paths = archives if isinstance(archives, list) else [archives]
    arch = spark.read.parquet(*paths)
    decoded = gfs_binary.decode_archive(arch)
    samples = decoded.select(
        F.col("series_key"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        (F.col("value_long").cast("double") / 1e6).alias("value"),
    )
    if config_path:
        cfg = config_mod.load_config(config_path)
        samples = apply_series_config(samples, cfg, spark)
    samples = samples.withColumn(
        "part", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    return run_from_samples(spark, out, samples, job_id=job_id, salt=salt)


def apply_series_config(
    samples: DataFrame, cfg, spark: SparkSession
) -> DataFrame:
    """Interpret 'ResourceType.statName'-shaped series keys through the
    mapping config (rename / drop / include / exclude / labels), then fold
    the surviving labels back into the series key so downstream tiers stay
    keyed on one column."""
    split = F.split(F.col("series_key"), r"\.", 2)
    stats = samples.withColumn("resource_type", split.getItem(0)).withColumn(
        "stat_name", F.coalesce(split.getItem(1), F.lit(""))
    )
    mapped = mapping.apply_config(stats, cfg, spark)
    label_str = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.map_keys(F.col("labels"))),
            lambda k: F.concat_ws("=", k, F.col("labels")[k]),
        ),
    )
    key = F.when(label_str == "", F.col("metric")).otherwise(
        F.concat(F.col("metric"), F.lit("{"), label_str, F.lit("}"))
    )
    return mapped.select(key.alias("series_key"), "ts", "value")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--archives", required=True, nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--job-id", default="convert")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app="convert", cpus=args.cpus)
    written = convert(spark, args.archives, args.out, args.config, args.job_id)
    print(written)


if __name__ == "__main__":
    main()
