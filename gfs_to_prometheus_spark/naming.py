"""Metric-name synthesis and validity filters (P1/P4/P5/P6, F1/F2/F5).

Reference behavior being reproduced (NOT ported — these are declarative
Column expressions Catalyst folds into the scan projection):

* P1 name synthesis (/root/reference/internal/converter/converter.go:165-176,
  duplicated at internal/cluster/converter.go:118-126 and
  java-extractor/AllStatsExtractor.java:132-145): metric =
  "<prefix>_<resource_type>_<stat>", lowercased, spaces/dashes -> '_'.
* F1 resource-type validity (converter.go:133-146): length 1..100 and
  printable ASCII only.
* F2 instance validity (converter.go:148-163): length 1..200 and >=80%
  printable characters.
* F5 value sanity (AllStatsExtractor.java:83-85, statarchive.go:1005-1021):
  drop NaN/Inf; magnitude caps |double|<=1e15.
* P4/P5 node identity (internal/cluster/processor.go:171-217): regex
  capture from the file path; node type by substring match.
* P6 environment inference (internal/cluster/converter.go:98-116).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def clean_component(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(c), "[ -]", "_")


def metric_name(prefix: str, resource_type: Column | str, stat: Column | str) -> Column:
    """P1: gemfire_<resourcetype>_<statname>."""
    return F.concat_ws(
        "_", F.lit(prefix), clean_component(resource_type), clean_component(stat)
    )


def valid_resource_type(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.length(c).between(1, 100) & c.rlike(r"^[ -~]+$")


def valid_instance(c: Column | str) -> Column:
    """Length 1..200 with >=80% printable chars (F2)."""
    c = F.col(c) if isinstance(c, str) else c
    printable = F.length(F.regexp_replace(c, r"[^ -~]", ""))
    return F.length(c).between(1, 200) & (
        printable.cast("double") >= F.length(c).cast("double") * 0.8
    )


def valid_value(c: Column | str, cap: float = 1e15) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return ~F.isnan(c) & c.between(-cap, cap)


def node_type_from_name(name: Column | str) -> Column:
    """P5: substring inference (processor.go:200-217)."""
    c = F.lower(F.col(name) if isinstance(name, str) else name)
    return (
        F.when(c.contains("locator"), F.lit("locator"))
        .when(c.contains("gateway"), F.lit("gateway"))
        .when(c.contains("server"), F.lit("server"))
        .otherwise(F.lit("unknown"))
    )


def environment_from_cluster(cluster: Column | str) -> Column:
    """P6: substring inference (cluster/converter.go:98-116)."""
    c = F.lower(F.col(cluster) if isinstance(cluster, str) else cluster)
    return (
        F.when(c.contains("prod"), F.lit("production"))
        .when(c.contains("stag"), F.lit("staging"))
        .when(c.contains("dev"), F.lit("development"))
        .when(c.contains("test"), F.lit("test"))
        .otherwise(F.lit("unknown"))
    )


def node_from_path(path: Column | str, pattern: str = r".*/([^/]+)/stats/[^/]*$") -> Column:
    """P4: node identity captured from the archive file path
    (processor.go:171-198). Use with input_file_name() on file sources."""
    c = F.col(path) if isinstance(path, str) else path
    return F.regexp_extract(c, pattern, 1)


def series_metric(key: Column | str) -> Column:
    """metric name from a 'metric{k=v,...}' series key (P1 inverse)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.regexp_extract(c, r"^([^{]+)", 1)


def series_label(key: Column | str, label: str) -> Column:
    """One label's value from a 'metric{k=v,...}' series key ('' if absent).

    Same regex in ANSI SQL (the oracle mirrors it), so label selection is
    a plain column expression the scan can filter on — the PromQL
    {label="v"} / {label=~"re"} matchers become rlike/eq over this.
    The label name is regex-escaped (a label like 'node.type' must not
    match arbitrary characters)."""
    import re

    c = F.col(key) if isinstance(key, str) else key
    return F.regexp_extract(c, r"[{,]" + re.escape(label) + r"=([^,}]+)", 1)


def rebuild_with_label(
    key: Column | str, label: str, value: Column
) -> Column:
    """'metric{k=v,...}' with `label` set to `value` (replacing any
    existing entry), labels kept ALPHABETICALLY sorted — the canonical key
    form, so rewritten keys compare equal across engines. Array ops only
    (split/filter/sort_array/array_join): every step has a DuckDB list_*
    twin for the oracle."""
    c = F.col(key) if isinstance(key, str) else key
    inner = F.regexp_extract(c, r"\{(.*)\}$", 1)
    parts = F.filter(
        F.split(inner, ","),
        lambda p: (p != "") & ~p.like(label.replace("_", r"\_") + "=%"),
    )
    added = F.concat(
        parts, F.array(F.concat(F.lit(label + "="), value))
    )
    return F.concat(
        series_metric(c), F.lit("{"), F.array_join(F.sort_array(added), ","),
        F.lit("}"),
    )


def label_replace(
    key: Column | str, dst: str, replacement: str, src: str, regex: str
) -> Column:
    """PromQL label_replace(v, dst, replacement, src, regex): if `regex`
    (anchored, as PromQL) fully matches src's value, dst is set to
    `replacement` with $1-style group references; otherwise the key is
    returned UNCHANGED (PromQL leaves the series untouched on no-match).
    `replacement` uses Java/Spark $N syntax — the SQL oracle writes the
    same pattern with DuckDB's \\N syntax."""
    c = F.col(key) if isinstance(key, str) else key
    src_val = series_metric(c) if src == "__name__" else series_label(c, src)
    anchored = "^(?:" + regex + ")$"
    new_val = F.regexp_replace(src_val, anchored, replacement)
    return F.when(
        src_val.rlike(anchored), rebuild_with_label(c, dst, new_val)
    ).otherwise(c)


def label_join(
    key: Column | str, dst: str, sep: str, srcs: list[str]
) -> Column:
    """PromQL label_join(v, dst, sep, src...): dst = the src label values
    joined with sep (absent labels join as '')."""
    c = F.col(key) if isinstance(key, str) else key
    vals = [series_label(c, s) for s in srcs]
    return rebuild_with_label(c, dst, F.concat_ws(sep, *vals))
