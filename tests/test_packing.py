"""Sequence packing: concatenation + fixed-length invariants, and
parallelism-independence of the two-level prefix sum."""

from __future__ import annotations

from pyspark.sql import functions as F

from gfs_to_prometheus_spark.operators import packing


def _packed(spark, rows, seq_len, bucket_docs=4):
    seq = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, n_tok int"
    )
    return packing.pack_sequences(
        seq, seq_len=seq_len, bucket_docs=bucket_docs
    ).orderBy("seq_id")


def test_pack_concatenation_invariant(spark):
    rows = [
        (i, [int(x) for x in range((i * 7) % 5 + 1)], (i * 7) % 5 + 1)
        for i in range(37)
    ]
    out = _packed(spark, rows, seq_len=8).collect()
    stream = [t for _, toks, _ in rows for t in toks]
    got = [t for r in out for t in r["tokens"]]
    assert got == stream  # token order == doc-ordered concatenation
    # every row full except possibly the last
    for r in out[:-1]:
        assert r["n_tok"] == 8 and len(r["tokens"]) == 8
    assert out[-1]["n_tok"] == len(stream) - 8 * (len(out) - 1)
    assert [r["seq_id"] for r in out] == list(range(len(out)))


def test_pack_stable_across_parallelism_and_buckets(spark):
    rows = [
        (i, [int((i * 31 + j) % 97) for j in range((i % 6) + 1)], (i % 6) + 1)
        for i in range(64)
    ]
    base = [
        (r["seq_id"], tuple(r["tokens"]), r["n_docs"], r["first_doc_id"])
        for r in _packed(spark, rows, seq_len=10, bucket_docs=4).collect()
    ]
    for bd in (1, 7, 1000):
        seq = spark.createDataFrame(
            rows, "doc_id long, tokens array<int>, n_tok int"
        ).repartition(13)
        got = [
            (r["seq_id"], tuple(r["tokens"]), r["n_docs"], r["first_doc_id"])
            for r in packing.pack_sequences(seq, 10, bucket_docs=bd)
            .orderBy("seq_id")
            .collect()
        ]
        assert got == base, bd


def test_tokenize_shape(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, " x  y ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in packing.tokenize(df).collect()}
    assert out[0]["n_tok"] == 3 and len(out[0]["tokens"]) == 3
    assert out[1]["n_tok"] == 2
    assert all(0 <= t < packing.VOCAB for t in out[0]["tokens"])


def test_pack_bounds_mark_doc_starts(spark):
    """bounds = in-row positions of each document's FIRST token; rows
    inside a straddling doc carry no phantom boundary at position 0."""
    rows = [
        (0, list(range(5)), 5),     # starts seq0 pos0
        (1, list(range(12)), 12),   # starts seq0 pos5, straddles into seq1+2
        (2, list(range(3)), 3),     # starts seq2 pos1
    ]
    out = {
        r["seq_id"]: r
        for r in _packed(spark, rows, seq_len=8, bucket_docs=4).collect()
    }
    assert out[0]["bounds"] == [0, 5]
    assert out[1]["bounds"] == []      # fully inside doc 1 -> no reset
    assert out[2]["bounds"] == [1]
