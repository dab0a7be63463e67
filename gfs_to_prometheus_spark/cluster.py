"""Cluster-mode processing: directory-tree discovery + node identity from
file paths feeding the resumable pipeline — the Spark-first analog of the
reference's cluster processor (/root/reference/internal/cluster/
processor.go:98-234).

The reference walks the tree with filepath.Glob per node-pattern, filters
exclude regexes, regex-captures the node name, infers node type and
environment by substring, then fans files out over a goroutine semaphore.
Here:

* discovery IS the scan: `spark.read.parquet(root)` with
  `recursiveFileLookup` + `pathGlobFilter` (F4) — the driver lists files
  in parallel and partitions ARE the concurrency unit (no semaphore);
* exclude patterns become an `input_file_name()` rlike filter, pushed to
  run before any decode work;
* node/cluster identity is a regexp_extract PROJECTION on the path
  column (P4/P5/P6, naming.py) — Catalyst folds it into the scan, so the
  per-file converter-wrapping of processor.go:219-234 collapses into
  ordinary column expressions.

Archive files hold the wire-format records of sources/gfs_binary (one
binary record per series: modified-UTF8 name + delta/compact payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .naming import environment_from_cluster, node_from_path, node_type_from_name
from .sources import gfs_binary

#: path convention: <root>/<cluster>/<node>/stats/<archive file>
CLUSTER_PATTERN = r".*/([^/]+)/[^/]+/stats/[^/]*$"


def discover_archives(
    spark: SparkSession,
    root: str,
    glob: str = "*.parquet",
    exclude: list[str] | None = None,
) -> DataFrame:
    """Recursive discovery with include-glob (F4) and exclude regexes
    (processor.go:162-168), tagging each row with its source path."""
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .parquet(root)
        .withColumn("_path", F.input_file_name())
    )
    for rx in exclude or []:
        df = df.filter(~F.col("_path").rlike(rx))
    return df


def enrich_with_node_labels(df: DataFrame, path: str = "_path") -> DataFrame:
    """P4/P5/P6: node from the path's stats-dir parent, cluster from the
    grandparent, type and environment by substring inference. Unmatched
    paths get node 'unknown' and the reference's 'server' default type
    (processor.go:173-180)."""
    node = node_from_path(F.col(path))
    cluster = F.regexp_extract(F.col(path), CLUSTER_PATTERN, 1)
    node_nz = F.when(node == "", F.lit("unknown")).otherwise(node)
    typ = node_type_from_name(F.concat_ws("/", node_nz, F.col(path)))
    return (
        df.withColumn("node", node_nz)
        .withColumn("cluster", F.when(cluster == "", "unknown").otherwise(cluster))
        .withColumn(
            "node_type",
            F.when(typ == "unknown", F.lit("server")).otherwise(typ),
        )
        .withColumn("environment", environment_from_cluster(F.col("cluster")))
    )


def cluster_samples(
    spark: SparkSession,
    root: str,
    glob: str = "*.parquet",
    exclude: list[str] | None = None,
) -> DataFrame:
    """Discovery -> path-derived node labels -> wire decode, with the
    labels riding through the decoder onto every sample (the reference's
    ClusterConverter label attach, cluster/converter.go:34-61, as decode
    passthrough columns instead of a wrapped converter)."""
    arch = enrich_with_node_labels(discover_archives(spark, root, glob, exclude))
    labels = ["cluster", "node", "node_type", "environment"]
    return gfs_binary.decode_archive(
        arch.select("n", "record", *labels), passthrough=labels
    ).withColumnRenamed("series_key", "metric")


def run_cluster_job(
    spark: SparkSession,
    root: str,
    out: str,
    job_id: str = "cluster",
    glob: str = "*.parquet",
    exclude: list[str] | None = None,
    salt: int = 2,
) -> dict[str, int]:
    """End-to-end: discover -> enrich -> decode -> resumable pipeline
    (jobs/pipeline.run_from_samples), series keyed per node."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from jobs.pipeline import run_from_samples

    s = cluster_samples(spark, root, glob, exclude)
    samples = (
        s.withColumn(
            "series_key",
            F.concat_ws(
                "|", "cluster", "node", "node_type", "environment", "metric"
            ),
        )
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withColumn("value", F.col("value_long").cast("double") / 1e6)
        .withColumn("part", F.date_format(F.col("ts"), "yyyy-MM-dd"))
        .select("series_key", "ts", "value", "part")
    )
    return run_from_samples(spark, out, samples, job_id=job_id, salt=salt)
