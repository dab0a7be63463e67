"""YAML config loader — the analog of the reference's config.Load
(/root/reference/internal/config/config.go:38-50, example shape at
/root/reference/config.example.yaml).

Parses the same document shape into EngineConfig (mapping.py):

  metric_prefix: <str>                      # default "gemfire"
  filters:
    include_resource_types: [..]            # F3
    exclude_resource_types: [..]
    include_stats: [..]
    exclude_stats: [..]
  metric_mappings:                          # P7 / F7
    "ResourceType.stat":
      name: <renamed metric>                # optional
      labels: {k: v, ...}                   # optional
      drop: true                            # optional
  label_mappings: {k: v, ...}               # P8 globals

Unknown keys are ignored (the Go yaml.Unmarshal behavior); omitted keys
keep Default()'s values.
"""

from __future__ import annotations

import yaml

from .mapping import EngineConfig, MappingRule


def parse_config(text: str) -> EngineConfig:
    doc = yaml.safe_load(text) or {}
    if not isinstance(doc, dict):
        raise ValueError("config root must be a mapping")
    filters = doc.get("filters") or {}
    if not isinstance(filters, dict):
        raise ValueError("config 'filters' must be a mapping")
    raw_mappings = doc.get("metric_mappings") or {}
    if not isinstance(raw_mappings, dict):
        raise ValueError("config 'metric_mappings' must be a mapping")
    raw_labels = doc.get("label_mappings") or {}
    if not isinstance(raw_labels, dict):
        raise ValueError("config 'label_mappings' must be a mapping")
    mappings = []
    for key, spec in raw_mappings.items():
        spec = spec or {}
        if not isinstance(spec, dict):
            raise ValueError(
                f"metric_mappings[{key!r}] must be a mapping, got {type(spec).__name__}"
            )
        mappings.append(
            MappingRule(
                key=str(key),
                name=spec.get("name"),
                labels={str(k): str(v) for k, v in (spec.get("labels") or {}).items()},
                drop=bool(spec.get("drop", False)),
            )
        )
    return EngineConfig(
        metric_prefix=doc.get("metric_prefix") or "gemfire",
        label_mappings={str(k): str(v) for k, v in raw_labels.items()},
        metric_mappings=mappings,
        include_resource_types=list(filters.get("include_resource_types") or []),
        exclude_resource_types=list(filters.get("exclude_resource_types") or []),
        include_stats=list(filters.get("include_stats") or []),
        exclude_stats=list(filters.get("exclude_stats") or []),
    )


def load_config(path: str) -> EngineConfig:
    with open(path, "r", encoding="utf-8") as fh:
        return parse_config(fh.read())
