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


YAML_CFG = """
# engine config exercising every reference config feature
metric_prefix: gemfire

filters:
  include_resource_types:
    - CachePerfStats
    - DistributionStats
    - VMStats
  exclude_resource_types:
    - InternalDistributedSystemStats
  include_stats: []
  exclude_stats:
    - internalUseOnly

metric_mappings:
  "CachePerfStats.puts":
    name: cache_operations_total
    labels:
      operation: put
  "CachePerfStats.debugMetric":
    drop: true

label_mappings:
  env: production
"""


def test_yaml_config_loader_matches_programmatic(spark, tmp_path):
    """Parsing the YAML shape of the reference's config
    (internal/config/config.go:9-27) must behave identically to the
    hand-built EngineConfig above, end to end through apply_config."""
    from gfs_to_prometheus_spark.config import load_config, parse_config

    cfg = parse_config(YAML_CFG)
    assert cfg.metric_prefix == "gemfire"
    assert cfg.exclude_resource_types == ["InternalDistributedSystemStats"]
    assert cfg.include_stats == []
    by_key = {r.key: r for r in cfg.metric_mappings}
    assert by_key["CachePerfStats.puts"].name == "cache_operations_total"
    assert by_key["CachePerfStats.puts"].labels == {"operation": "put"}
    assert by_key["CachePerfStats.debugMetric"].drop is True

    out_yaml = apply_config(_stats_df(spark), cfg, spark).collect()
    out_prog = apply_config(_stats_df(spark), CFG, spark).collect()
    key = lambda r: (r["resource_type"], r["stat_name"])
    ry, rp = {key(r): r for r in out_yaml}, {key(r): r for r in out_prog}
    assert set(ry) == set(rp)
    for k in ry:
        assert ry[k]["metric"] == rp[k]["metric"]
        assert dict(ry[k]["labels"]) == dict(rp[k]["labels"])

    # file path + defaults: omitted keys keep Default() values (config.go:29-36)
    p = tmp_path / "cfg.yaml"
    p.write_text("filters:\n  exclude_stats: [x]\n")
    c2 = load_config(str(p))
    assert c2.metric_prefix == "gemfire"
    assert c2.exclude_stats == ["x"]
    assert c2.metric_mappings == [] and c2.label_mappings == {}
