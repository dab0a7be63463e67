"""Hot-series skew control: the salt sub-key must split the dominant
series' chunk groups (north_rule: explicit salt-bucketed repartitioning;
AQE cannot split a single applyInPandas/mapInPandas group)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gfs_to_prometheus_spark import chunks, synth


def test_salt_splits_hot_groups(spark):
    seq = synth.sequences(spark, 400)
    samples = (
        synth.samples_from_sequences(seq)
        .groupBy("series_key", "ts_ms")
        .agg(F.max("value").alias("value"))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    flat = chunks.encode_chunks(samples, series=("series_key",), salt=1)
    salted = chunks.encode_chunks(samples, series=("series_key",), salt=8)

    def max_group(df):
        return df.agg(F.max("n")).collect()[0][0]

    m1, m8 = max_group(flat), max_group(salted)
    # the hot series dominates sample volume; 8-way salting must cut the
    # largest single group by at least 4x (hash balance isn't perfect)
    assert m8 <= m1 / 4, (m1, m8)

    # and the data survives intact either way
    n_flat = chunks.decode_chunks(flat, series=("series_key",)).count()
    n_salted = chunks.decode_chunks(salted, series=("series_key",)).count()
    assert n_flat == n_salted == samples.count()


def test_roundtrip_chunks_matches_unfused_pair(spark):
    """The fused roundtrip (one Python crossing) must be bit-identical to
    decode_chunks(encode_chunks(...)) — same kernels, same wire bytes —
    including under salting and mid-group Arrow-batch cuts."""
    seq = synth.sequences(spark, 300)
    samples = (
        synth.samples_from_sequences(seq)
        .groupBy("series_key", "ts_ms")
        .agg(F.max("value").alias("value"))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    for salt, mcs in ((1, 4096), (4, 64)):
        fused = chunks.roundtrip_chunks(
            samples, series=("series_key",), salt=salt, max_chunk_samples=mcs
        )
        pair = chunks.decode_chunks(
            chunks.encode_chunks(
                samples, series=("series_key",), salt=salt,
                max_chunk_samples=mcs,
            ),
            series=("series_key",),
        )
        a = sorted(map(tuple, fused.collect()))
        b = sorted(map(tuple, pair.collect()))
        assert a == b, (salt, mcs, len(a), len(b))
