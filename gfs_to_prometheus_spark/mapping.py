"""Config-driven metric remapping and include/exclude filtering
(P7/P8, F3/F7) — the analog of the reference's YAML config model
(/root/reference/internal/config/config.go:9-27,
/root/reference/config.example.yaml:8-52).

Spark-first shape: the mapping table is a tiny dimension -> broadcast
LEFT join keyed on "ResourceType.stat"; `drop` rules filter post-join;
unmapped metrics keep their synthesized default name via coalesce.
Include/exclude lists become isin() predicates (pushed into the scan) —
semi/anti joins only if a list ever outgrows broadcast size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .naming import metric_name


@dataclass
class MappingRule:
    """One metric_mappings entry (config.go:16-20)."""

    key: str  # "ResourceType.statName"
    name: str | None = None  # rename; None keeps the synthesized name
    labels: dict[str, str] = field(default_factory=dict)
    drop: bool = False


@dataclass
class EngineConfig:
    """Mirrors config.Config (config.go:9-27)."""

    metric_prefix: str = "gemfire"
    label_mappings: dict[str, str] = field(default_factory=dict)  # P8 globals
    metric_mappings: list[MappingRule] = field(default_factory=list)
    include_resource_types: list[str] = field(default_factory=list)
    exclude_resource_types: list[str] = field(default_factory=list)
    include_stats: list[str] = field(default_factory=list)
    exclude_stats: list[str] = field(default_factory=list)


def mapping_table(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    rows = [
        (r.key, r.name, list(r.labels.items()), r.drop) for r in cfg.metric_mappings
    ]
    return spark.createDataFrame(
        rows or [("__none__", None, [], False)],
        "key string, mapped_name string, extra_labels array<struct<k:string,v:string>>, drop boolean",
    )


def apply_config(
    df: DataFrame,
    cfg: EngineConfig,
    spark: SparkSession,
    resource_type: str = "resource_type",
    stat: str = "stat_name",
) -> DataFrame:
    """filters (F3/F7) -> name synthesis (P1) -> remap join (P7/J4) ->
    global labels (P8). Returns df + `metric` + label columns."""
    # F3 include/exclude — simple predicates, pushed to the scan
    if cfg.include_resource_types:
        df = df.filter(F.col(resource_type).isin(cfg.include_resource_types))
    if cfg.exclude_resource_types:
        df = df.filter(~F.col(resource_type).isin(cfg.exclude_resource_types))
    if cfg.include_stats:
        df = df.filter(F.col(stat).isin(cfg.include_stats))
    if cfg.exclude_stats:
        df = df.filter(~F.col(stat).isin(cfg.exclude_stats))

    default_name = metric_name(cfg.metric_prefix, resource_type, stat)
    key = F.concat_ws(".", F.col(resource_type), F.col(stat))
    df = df.withColumn("_map_key", key).withColumn("_default_metric", default_name)

    m = mapping_table(spark, cfg)
    df = df.join(F.broadcast(m), df["_map_key"] == m["key"], "left")

    # F7 drop rules, then P7 rename with default fallback
    df = df.filter((F.col("drop").isNull()) | (~F.col("drop")))
    df = df.withColumn(
        "metric", F.coalesce(F.col("mapped_name"), F.col("_default_metric"))
    )
    # P7 extra labels + P8 global labels as a map column
    extra = F.map_from_entries(
        F.coalesce(F.col("extra_labels"), F.array().cast("array<struct<k:string,v:string>>"))
    )
    globals_map = (
        F.create_map(
            *[F.lit(x) for kv in cfg.label_mappings.items() for x in kv]
        )
        if cfg.label_mappings
        else F.map_from_arrays(F.array(), F.array()).cast("map<string,string>")
    )
    df = df.withColumn("labels", F.map_concat(extra, globals_map))
    return df.drop("key", "mapped_name", "extra_labels", "drop", "_map_key", "_default_metric")
