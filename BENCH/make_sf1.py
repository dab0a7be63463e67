#!/usr/bin/env python
"""Deterministic sf1.0 bench tables: a 10x scale-up of the driver's sf0.1
parquet, synthesized in-Spark (no RNG, no external data — per the brief,
larger-SF inputs must be derived deterministically).

Scale-up rules (shape-preserving, not row duplication):
* events   — 10 copies; copy k shifts ts by k*32 days (day-aligned, spans
  stay disjoint: 10x samples per series = longer history, series
  cardinality unchanged, the realistic way a timeseries table grows),
  offsets user_id by k*10_000 and event_id by k*10**9.
* documents — 10 copies; copy k gets doc_id + k*10^6 and (k>0) a 'c{k} '
  text prefix (distinct shingles/minhashes, so near-dup candidate counts
  grow ~linearly instead of exploding into cross-copy identical pairs);
  n_chars recomputed.
* embeddings — 10 copies; copy k rotates the 64-dim vector by k positions
  (norm-preserving, distinct directions) and offsets vec_id by k*n.
* lineitem/orders — 10 copies with order-key offsets k*150_000 (same join
  fan-in per customer; aggregate shapes scale linearly).
* dims (customer/nation/region/part/supplier) — copied as-is.

Output is cached under .benchdata/sf1.0 with a _COMPLETE marker; delete
the directory to regenerate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

FACTOR = 10
DAY_MS = 86_400_000
EV_SHIFT_MS = 32 * DAY_MS  # sf0.1 events span 30 days


def _copies(spark: SparkSession, factor: int) -> DataFrame:
    return spark.range(factor).withColumnRenamed("id", "_k")


def ensure_sf1(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = FACTOR
) -> str:
    def src(t: str) -> DataFrame:
        return spark.read.parquet(f"{src_dir}/{t}.parquet")

    # the marker carries a SOURCE fingerprint: if the driver regenerates
    # sf0.1, a stale cached scale-up would silently corrupt the
    # per-row-cost ratios (numerator no longer 10x the denominator's rows)
    fingerprint = (
        f"factor={factor} src={src_dir} "
        f"events={src('events').count()} documents={src('documents').count()}"
    )
    marker = os.path.join(dst_dir, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == fingerprint:
                return dst_dir
        import shutil

        shutil.rmtree(dst_dir)  # stale vs source — regenerate
    os.makedirs(dst_dir, exist_ok=True)
    k = F.col("_k")

    def write(df: DataFrame, t: str) -> None:
        df.write.mode("overwrite").parquet(f"{dst_dir}/{t}.parquet")

    cps = _copies(spark, factor)

    ev = src("events").crossJoin(cps).select(
        (F.col("event_id") + k * 1_000_000_000).alias("event_id"),
        F.timestamp_millis(
            F.unix_millis(F.col("ts").cast("timestamp")) + k * EV_SHIFT_MS
        ).alias("ts"),
        (F.col("user_id") + k * 10_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    write(ev, "events")

    doc = src("documents").crossJoin(cps).select(
        (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
        F.when(k == 0, F.col("text"))
        .otherwise(F.concat(F.lit("c"), k.cast("string"), F.lit(" "), "text"))
        .alias("text"),
        "lang",
        "source",
    )
    write(doc.withColumn("n_chars", F.length("text").cast("int")), "documents")

    n_vec = src("embeddings").count()
    dim = 64
    rot = F.when(k == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice("embedding", (k + 1).cast("int"), F.lit(dim) - k.cast("int")),
            F.slice("embedding", 1, k.cast("int")),
        )
    )
    emb = src("embeddings").crossJoin(cps).select(
        (F.col("vec_id") + k * n_vec).alias("vec_id"),
        rot.alias("embedding"),
        "label",
    )
    write(emb, "embeddings")

    li = src("lineitem").crossJoin(cps).select(
        (F.col("l_orderkey") + k * 150_000).alias("l_orderkey"),
        *[c for c in src("lineitem").columns if c != "l_orderkey"],
    )
    write(li, "lineitem")

    od = src("orders").crossJoin(cps).select(
        (F.col("o_orderkey") + k * 150_000).alias("o_orderkey"),
        *[c for c in src("orders").columns if c != "o_orderkey"],
    )
    write(od, "orders")

    for t in ("customer", "nation", "region", "part", "supplier"):
        write(src(t), t)

    with open(marker, "w") as f:
        f.write(fingerprint + "\n")
    return dst_dir


if __name__ == "__main__":
    import sys

    HERE = os.path.dirname(os.path.abspath(__file__))
    REPO = os.path.dirname(HERE)
    sys.path.insert(0, REPO)
    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app="make_sf1", cpus=32)
    dst = ensure_sf1(
        spark,
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        os.path.join(REPO, ".benchdata", "sf1.0"),
    )
    print({"sf1_dir": dst})
