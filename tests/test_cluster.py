"""End-to-end cluster job: directory-tree discovery, glob excludes, node
labels from paths, wire decode, resumable pipeline (SURVEY §2 P4/P5/P6 +
F4 as one job, mirroring internal/cluster/processor.go:98-234)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gfs_to_prometheus_spark import cluster
from gfs_to_prometheus_spark.sources import gfs_binary


def _write_node(spark, root, clu, node, n=400, base=1_700_000_000_000):
    df = spark.range(n).select(
        F.lit("cpu_busy").alias("series_key"),
        (F.lit(base) + F.col("id") * 60_000).alias("ts_ms"),
        (F.col("id") % 50 * 1_000_000).alias("value_long"),
    )
    arch = gfs_binary.encode_archive(df)
    arch.write.mode("overwrite").parquet(f"{root}/{clu}/{node}/stats")


def test_cluster_job_end_to_end(spark, tmp_path):
    root = str(tmp_path / "tree")
    out = str(tmp_path / "tsdb")
    _write_node(spark, root, "prod-east", "server-01")
    _write_node(spark, root, "prod-east", "locator-02")
    _write_node(spark, root, "dev-local", "gateway-01")
    # a file the exclude regex must drop
    _write_node(spark, root, "prod-east", "ignore-me")

    samples = cluster.cluster_samples(
        spark, root, exclude=[r".*/ignore-me/.*"]
    )
    rows = samples.groupBy("cluster", "node", "node_type", "environment").count()
    got = {
        (r["cluster"], r["node"], r["node_type"], r["environment"]): r["count"]
        for r in rows.collect()
    }
    assert got == {
        ("prod-east", "server-01", "server", "production"): 400,
        ("prod-east", "locator-02", "locator", "production"): 400,
        ("dev-local", "gateway-01", "gateway", "development"): 400,
    }

    written = cluster.run_cluster_job(
        spark, root, out, exclude=[r".*/ignore-me/.*"]
    )
    assert written["rollup_5m"] > 0 and written["chunks"] > 0
    r5 = spark.read.parquet(f"{out}/rollup_5m")
    keys = {r["series_key"] for r in r5.select("series_key").distinct().collect()}
    assert keys == {
        "prod-east|server-01|server|production|cpu_busy",
        "prod-east|locator-02|locator|production|cpu_busy",
        "dev-local|gateway-01|gateway|development|cpu_busy",
    }
    # resumable: a second run with nothing new writes nothing
    again = cluster.run_cluster_job(
        spark, root, out, exclude=[r".*/ignore-me/.*"]
    )
    assert again == {}
