"""Late-data merge: tiers updated in place must equal a from-scratch run
over (on-time + late) samples; too-late samples are rejected (ST5 30d
out-of-order window)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gfs_to_prometheus_spark import late
from jobs import pipeline

N_DOCS = 300


def _fingerprint(spark, root, table):
    df = spark.read.parquet(os.path.join(root, table))
    (row,) = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(*sorted(df.columns))), F.lit(0)).alias("chk"),
    ).collect()
    return row["n"], row["chk"]


def test_late_merge_equals_full_recompute(spark, tmp_path):
    a, b = str(tmp_path / "late"), str(tmp_path / "full")

    all_samples = pipeline.build_samples(spark, N_DOCS).cache()
    # hold back ~10% of samples as "late arrivals" (deterministic split)
    is_late = F.pmod(F.xxhash64("series_key", "ts_ms"), F.lit(10)) == 0
    on_time = all_samples.filter(~is_late)
    late_df = all_samples.filter(is_late).select("series_key", "ts", "value")

    # run A: pipeline over on-time only, then merge the late tranche
    pipeline.run_from_samples(spark, a, on_time, job_id="ontime")
    updated = late.merge_late_samples(spark, a, late_df, series=("series_key",))
    assert updated["rollup_5m"]

    # run B: pipeline over everything at once
    pipeline.run_from_samples(spark, b, all_samples, job_id="full")

    for table in ("rollup_5m", "rollup_1h", "rollup_1d"):
        assert _fingerprint(spark, a, table) == _fingerprint(spark, b, table), table


def test_too_late_samples_rejected(spark, tmp_path):
    out = str(tmp_path / "ooo")
    samples = pipeline.build_samples(spark, N_DOCS)
    pipeline.run_from_samples(spark, out, samples, job_id="base")
    before = _fingerprint(spark, out, "rollup_5m")
    stale = samples.select("series_key", "ts", "value").limit(50)
    # now = far in the future -> everything is beyond the 30d window
    upd = late.merge_late_samples(
        spark, out, stale, series=("series_key",),
        now_ms=4_000_000_000_000,
    )
    assert upd == {}
    assert _fingerprint(spark, out, "rollup_5m") == before
