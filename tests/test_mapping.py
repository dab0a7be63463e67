"""Metric-mapping suite (SURVEY.md §5.2-2), mirroring the reference's
config.example.yaml cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from gfs_to_prometheus_spark.mapping import EngineConfig, MappingRule, apply_config
from gfs_to_prometheus_spark.naming import (
    environment_from_cluster,
    metric_name,
    node_type_from_name,
    valid_instance,
    valid_resource_type,
    valid_value,
)


def _stats_df(spark):
    return spark.createDataFrame(
        [
            ("CachePerfStats", "puts", "cache", 1.0),
            ("CachePerfStats", "gets", "cache", 2.0),
            ("CachePerfStats", "debugMetric", "cache", 3.0),
            ("DistributionStats", "sentMessages", "dist", 4.0),
            ("VMStats", "internalUseOnly", "vm", 5.0),
            ("SecretStats", "hidden", "x", 6.0),
        ],
        "resource_type string, stat_name string, instance string, value double",
    )


CFG = EngineConfig(
    metric_prefix="gemfire",
    label_mappings={"env": "production"},
    metric_mappings=[
        MappingRule("CachePerfStats.puts", "cache_operations_total", {"operation": "put"}),
        MappingRule("CachePerfStats.debugMetric", drop=True),
    ],
    include_resource_types=["CachePerfStats", "DistributionStats", "VMStats"],
    exclude_stats=["internalUseOnly"],
)


def test_apply_config_end_to_end(spark):
    out = apply_config(_stats_df(spark), CFG, spark)
    rows = {r["stat_name"]: r for r in out.collect()}
    # F3 include: SecretStats gone; exclude_stats: internalUseOnly gone
    assert set(rows) == {"puts", "gets", "sentMessages"}
    # P7 rename + extra label
    assert rows["puts"]["metric"] == "cache_operations_total"
    assert rows["puts"]["labels"]["operation"] == "put"
    # P1 default name for unmapped
    assert rows["gets"]["metric"] == "gemfire_cacheperfstats_gets"
    assert rows["sentMessages"]["metric"] == "gemfire_distributionstats_sentmessages"
    # P8 global label on every row
    assert all(r["labels"]["env"] == "production" for r in rows.values())


def test_metric_name_cleaning(spark):
    df = spark.createDataFrame(
        [("Cache Perf-Stats", "delay Duration")], "rt string, st string"
    )
    (got,) = df.select(metric_name("gemfire", "rt", "st").alias("m")).collect()
    # spaces and dashes -> underscores, lowercased (converter.go:165-176)
    assert got["m"] == "gemfire_cache_perf_stats_delay_duration"


def test_validity_filters(spark):
    df = spark.createDataFrame(
        [("ok", "inst", 1.0),
         ("", "inst", 1.0),                      # F1: empty
         ("x" * 101, "inst", 1.0),               # F1: too long
         ("ok2", "\x00\x01\x02\x03\x04abc", 1.0),  # F2: <80% printable
         ("ok3", "inst", float("nan")),          # F5: NaN
         ("ok4", "inst", 1e16)],                 # F5: magnitude cap
        "resource_type string, instance string, value double",
    )
    kept = df.filter(
        valid_resource_type("resource_type")
        & valid_instance("instance")
        & valid_value("value")
    )
    assert [r["resource_type"] for r in kept.collect()] == ["ok"]


def test_node_and_env_inference(spark):
    df = spark.createDataFrame(
        [("gemfire-locator-0", "prod-east"), ("cache-server-1", "staging"),
         ("gw-gateway-2", "dev-box"), ("mystery", "qa")],
        "name string, cluster string",
    )
    got = df.select(
        node_type_from_name("name").alias("nt"),
        environment_from_cluster("cluster").alias("env"),
    ).collect()
    assert [r["nt"] for r in got] == ["locator", "server", "gateway", "unknown"]
    assert [r["env"] for r in got] == ["production", "staging", "development", "unknown"]
