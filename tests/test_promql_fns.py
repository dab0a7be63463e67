"""PromQL long-tail functions (holt_winters / clamp / sort_desc) validated
against an independent in-Python Prometheus-order reference (the oracle
parity test re-checks the same ops against DuckDB SQL)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gfs_to_prometheus_spark.rate import clamp, holt_winters, sort_desc

UTC = dt.timezone.utc


def _hw_ref(vals: list[float], sf: float, tf: float) -> float:
    """Prometheus promql/functions.go funcHoltWinters, verbatim order."""
    s0 = vals[0]
    b = vals[1] - vals[0]
    for v in vals[1:]:
        s1 = sf * v + (1 - sf) * (s0 + b)
        b = tf * (s1 - s0) + (1 - tf) * b
        s0 = s1
    return s0


def test_holt_winters_matches_python_reference(spark):
    vals = [1.0, 2.5, 4.25, 3.1, 9.7, 0.5, 12.0]
    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 0, i, tzinfo=UTC), v)
        for i, v in enumerate(vals)
    ]
    # a single-sample series must yield NULL (PromQL drops it)
    rows.append(("lone", dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=UTC), 5.0))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        r["event_type"]: r["smoothed"]
        for r in holt_winters(df, 3600, 0.25, 0.125).collect()
    }
    # bit-exact: dyadic factors + fixed IEEE op order on both sides
    assert out["a"] == _hw_ref(vals, 0.25, 0.125)
    assert out["lone"] is None


def test_holt_winters_order_independent_of_input_order(spark):
    """collect_list order is nondeterministic — the array_sort(ts) step
    must make the fold independent of row arrival order."""
    vals = [3.0, 1.0, 4.0, 1.5, 9.0]
    fwd = [
        ("a", dt.datetime(2024, 1, 1, 0, 0, i, tzinfo=UTC), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        list(reversed(fwd)), "event_type string, ts timestamp, value double"
    ).repartition(7)
    out = holt_winters(df, 3600, 0.25, 0.125).collect()[0]["smoothed"]
    assert out == _hw_ref(vals, 0.25, 0.125)


def test_clamp_bounds_and_inverted_range(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 50.0), (3, 500.0)], "id long, value double"
    )
    got = {
        r["id"]: r["clamped"]
        for r in clamp(df, vmin=0.0, vmax=100.0).collect()
    }
    assert got == {1: 0.0, 2: 50.0, 3: 100.0}
    one_sided = {
        r["id"]: r["clamped"] for r in clamp(df, vmin=0.0).collect()
    }
    assert one_sided == {1: 0.0, 2: 50.0, 3: 500.0}
    # PromQL: clamp with min > max returns empty; we keep row identity -> NULL
    inverted = clamp(df, vmin=10.0, vmax=5.0).collect()
    assert all(r["clamped"] is None for r in inverted)


def test_sort_desc_ranks_with_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("b", 2.0), ("a", 2.0), ("c", 9.0), ("d", 1.0)],
        "event_type string, value double",
    )
    got = [
        (r["rank"], r["event_type"])
        for r in sort_desc(df).orderBy("rank").collect()
    ]
    assert got == [(1, "c"), (2, "a"), (3, "b"), (4, "d")]
    asc = [
        (r["rank"], r["event_type"])
        for r in sort_desc(df, ascending=True).orderBy("rank").collect()
    ]
    assert asc == [(1, "d"), (2, "a"), (3, "b"), (4, "c")]
