"""Edge-case laws for the newer text operators (bm25 guard, chunker
window law, split stability)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfs_to_prometheus_spark.operators import text


def test_bm25_rejects_empty_terms(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one"):
        text.bm25_topk(df, [])


def test_chunker_window_count_law(spark):
    rows = [(0, "x" * 200), (1, "x" * 201), (2, "x" * 500), (3, "x" * 50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        text.chunk_documents(df, size=200, stride=150)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("n_chars").alias("minc"))
        .collect()
    )
    got = {r["doc_id"]: (r["n"], r["minc"]) for r in out}
    # n = 1 + ceil(max(len-size,0)/stride); final window = len - (n-1)*stride
    assert got[0] == (1, 200)
    assert got[1] == (2, 51)    # windows at 0 and 150 -> last holds 51
    assert got[2] == (3, 200)   # 0,150,300 -> 500-300=200
    assert got[3] == (1, 50)


def test_chunker_overlap_reconstructs_prefixes(spark):
    txt = "abcdefghij" * 30  # 300 chars
    df = spark.createDataFrame([(0, txt)], "doc_id long, text string")
    rows = (
        text.chunk_documents(df, size=200, stride=150)
        .orderBy("chunk_idx")
        .collect()
    )
    import hashlib

    assert [r["chunk_md5"] for r in rows] == [
        hashlib.md5(txt[0:200].encode()).hexdigest(),
        hashlib.md5(txt[150:300].encode()).hexdigest(),
    ]


def test_split_assignment_stable_under_growth(spark):
    """Adding documents never reassigns existing ones (the eval-set
    stability property)."""
    small = spark.createDataFrame(
        [(i,) for i in range(100)], "doc_id long"
    )
    big = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    )
    a = {r["doc_id"]: r["split"] for r in text.assign_splits(small).collect()}
    b = {r["doc_id"]: r["split"] for r in text.assign_splits(big).collect()}
    assert all(b[k] == v for k, v in a.items())
    # ratios roughly 8/1/1 on the larger set
    from collections import Counter

    c = Counter(b.values())
    assert c["train"] > c["val"] and c["train"] > c["test"]
    assert abs(c["train"] / 300 - 0.8) < 0.1


def test_chunk_documents_rejects_gapped_windows(spark):
    """stride > size would silently skip characters between windows (and
    the final window's n_chars arithmetic can go negative) — rejected."""
    import pytest

    df = spark.createDataFrame([("d1", "x" * 50)], "doc_id string, text string")
    with pytest.raises(ValueError, match="stride"):
        text.chunk_documents(df, size=10, stride=100)
    with pytest.raises(ValueError, match="positive"):
        text.chunk_documents(df, size=0, stride=1)


def test_assign_splits_rejects_mismatched_weights(spark):
    """len(weights) != len(names) used to zip-truncate: buckets past the
    last edge fell through every when() -> NULL split (docs silently in
    NO split). Now a hard error, as is any non-positive weight."""
    import pytest

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="same length"):
        text.assign_splits(df, weights=(8, 1, 1), names=("train", "val"))
    with pytest.raises(ValueError, match="> 0"):
        text.assign_splits(df, weights=(8, 0, 2), names=("a", "b", "c"))
