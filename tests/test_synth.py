"""Synthetic-fixture invariants (FIXTURES.md §1–2) + rollup parity vs a
single-process pandas reference (the 'VSD oracle' pattern,
/root/reference/README-WORKING-SOLUTION.md:63-67)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gfs_to_prometheus_spark import synth
from gfs_to_prometheus_spark.rollup import rollup, rollup_merge

N_DOCS = 300


def test_sequences_deterministic_and_invariant(spark):
    a = synth.sequences(spark, N_DOCS, partitions=4).orderBy("doc_id").collect()
    b = synth.sequences(spark, N_DOCS, partitions=7).orderBy("doc_id").collect()
    assert a == b  # parallelism-independent generation
    for r in a:
        assert r["n_tok"] == len(r["tokens"]) >= 1
        assert all(0 <= t < synth.VOCAB for t in r["tokens"])
    srcs = pd.Series([r["source"] for r in a]).value_counts(normalize=True)
    assert srcs["web"] > 0.6  # skew fixture


def test_samples_token_array_equality(spark):
    """input_hint per-row invariant: tokens reconstructed from the derived
    samples must equal the source table's tokens bit-for-bit."""
    seq = synth.sequences(spark, N_DOCS)
    samples = synth.samples_from_sequences(seq)
    rebuilt = (
        samples.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ).alias("tokens2")
        )
    )
    joined = seq.join(rebuilt, "doc_id")
    mismatches = joined.filter(F.col("tokens") != F.col("tokens2")).count()
    assert mismatches == 0
    assert joined.count() == N_DOCS


def test_hot_series_skew(spark):
    samples = synth.samples_from_sequences(synth.sequences(spark, N_DOCS))
    counts = samples.groupBy("series_key").count().toPandas()
    hot = counts.loc[counts["series_key"] == "series_0", "count"].iloc[0]
    assert hot / counts["count"].sum() > 0.3  # one series dominates


def _pandas_rollup(pdf: pd.DataFrame, step_ms: int) -> pd.DataFrame:
    pdf = pdf.sort_values(["series_key", "ts_ms"], kind="mergesort")
    pdf["bucket_ms"] = (pdf["ts_ms"] // step_ms) * step_ms
    pdf["vmic"] = np.floor(pdf["value"].to_numpy() * 1000000.0 + 0.5).astype(np.int64)
    g = pdf.groupby(["series_key", "bucket_ms"], as_index=False)
    out = g.agg(
        vmin=("value", "min"),
        vmax=("value", "max"),
        sum_micro=("vmic", "sum"),
        cnt=("value", "size"),
        last=("value", "last"),
        last_ts_ms=("ts_ms", "max"),
    )
    return out


def test_rollup_parity_vs_pandas_reference(spark):
    """Spark 5m/1h tiers == single-process pandas implementation, exactly,
    at every tier (north_rule exact-match criterion)."""
    seq = synth.sequences(spark, N_DOCS)
    samples = synth.samples_from_sequences(seq).withColumn(
        "ts", F.timestamp_millis(F.col("ts_ms"))
    )
    # ties on ts within a series are possible in the synth stream; make
    # 'last' deterministic by deduplicating to the max value per (series, ts)
    samples = samples.groupBy("series_key", "ts", "ts_ms").agg(
        F.max("value").alias("value")
    )
    t5 = rollup(samples, 300, series=("series_key",)).toPandas()
    t1h = rollup_merge(
        rollup(samples, 300, series=("series_key",)), 3600, series=("series_key",)
    ).toPandas()

    pdf = samples.select("series_key", "ts_ms", "value").toPandas()
    for got, step in ((t5, 300_000), (t1h, 3_600_000)):
        want = _pandas_rollup(pdf.copy(), step)
        cols = ["series_key", "bucket_ms", "vmin", "vmax", "sum_micro", "cnt", "last", "last_ts_ms"]
        got = got[cols].sort_values(["series_key", "bucket_ms"], ignore_index=True)
        want = want[cols].sort_values(["series_key", "bucket_ms"], ignore_index=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
