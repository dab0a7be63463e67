"""Time-series join operators Spark lacks as primitives: as-of join and
bucketized range join (SURVEY.md §2.5 notes the reference has none; these
are the standard extensions a time-series engine's users expect, and the
gap-fill grid is secretly an as-of join already).

Both are compositions of existing DataFrame ops — no custom Catalyst
strategy needed:

* as-of: union the probe and build sides with a type tag, one window
  sort per key, LOCF the build columns onto probe rows. One shuffle on
  the key, no range explosion, no skew beyond the key's own. This is
  the classic "merge as-of" expressed relationally.
* range join: map each interval to the time buckets it overlaps
  (explode), equi-join on (key, bucket), then refine with the exact
  predicate + dedup. Turns an O(n*m) theta join into an equi-join
  sized by true overlap density — the difference between a
  broadcast-nested-loop and a hash join at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    ts: str = "ts_ms",
    value_cols: Sequence[str] = ("value",),
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each probe row, attach the most recent build row at-or-before
    its timestamp (per key). NULL when none (or outside tolerance).

    probe: (on..., ts, <probe cols>); build: (on..., ts, value_cols...).
    Ties (equal ts on both sides) resolve to the build row (at-or-before
    includes equality), matching DuckDB's ASOF JOIN >= semantics.
    """
    on = list(on)
    p = probe.withColumn("_side", F.lit(1))
    b = build.withColumn("_side", F.lit(0))
    for c in p.columns:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast(p.schema[c].dataType))
    for c in b.columns:
        if c not in p.columns:
            p = p.withColumn(c, F.lit(None).cast(b.schema[c].dataType))
    u = p.unionByName(b.select(*p.columns))
    # order by (ts, side): build rows at equal ts sort BEFORE probe rows,
    # so last(build_col) at a probe row includes the equal-ts build value
    w = (
        W.partitionBy(*on)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = u
    for c in value_cols:
        src = F.when(F.col("_side") == 0, F.col(c))
        filled = filled.withColumn(f"_asof_{c}", F.last(src, ignorenulls=True).over(w))
    if tolerance_ms is not None:
        build_ts = F.when(F.col("_side") == 0, F.col(ts))
        filled = filled.withColumn("_asof_ts", F.last(build_ts, ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1)
    for c in value_cols:
        val = F.col(f"_asof_{c}")
        if tolerance_ms is not None:
            val = F.when(F.col(ts) - F.col("_asof_ts") <= tolerance_ms, val)
        out = out.withColumn(f"asof_{c}", val)
    drop = ["_side"] + [f"_asof_{c}" for c in value_cols]
    if tolerance_ms is not None:
        drop.append("_asof_ts")
    return out.drop(*drop, *[c for c in value_cols])


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts_ms",
    start: str = "start_ms",
    end: str = "end_ms",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """points ⋈ intervals where start <= ts < end, per key.

    Intervals explode to their overlapping buckets; points map to one
    bucket; the equi-join on (key, bucket) bounds the candidate set and
    the exact predicate refines. Intervals spanning many buckets cost
    proportionally — bound bucket_ms to the typical interval length.
    """
    on = list(on)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.floor(F.col(start) / bucket_ms)).cast("long"),
                (F.floor((F.col(end) - 1) / bucket_ms)).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "_bucket", F.floor(F.col(point_ts) / bucket_ms).cast("long")
    )
    joined = pt.join(iv, [*on, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    )
    return joined.drop("_bucket")
