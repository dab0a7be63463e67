"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle entirely — the technique for repeated big-big joins
at 100 TB (SURVEY §1.4 'bucketing for co-located joins')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark


def test_bucketed_join_has_no_exchange(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    a = ev.select("user_id", "value")
    b = ev.select("user_id", "event_type")
    spark.sql("DROP TABLE IF EXISTS b_a")
    spark.sql("DROP TABLE IF EXISTS b_b")
    a.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable("b_a")
    b.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable("b_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_a").join(spark.table("b_b"), "user_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # both sides read pre-bucketed -> no shuffle before the join
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert j.count() > 0
        # sanity: the same join WITHOUT bucketing does shuffle
        j2 = a.join(b, "user_id")
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_a")
        spark.sql("DROP TABLE IF EXISTS b_b")


def test_tpch_q3_no_fact_broadcast(spark):
    """The r3 scale-killer: tpch_q3 must not hint-broadcast the orders
    side (fact-scale at TPC-H proportions; OOMs executors at 100x).
    With auto-broadcast disabled, any BroadcastExchange left in the plan
    comes from an explicit hint — exactly one is allowed (customer)."""
    from gfs_to_prometheus_spark.queries import QUERIES

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = QUERIES["tpch_q3"](spark, "/root/testdata/sf0.01")
        plan = q._jdf.queryExecution().executedPlan().toString()
        n_bcast = plan.count("BroadcastExchange")
        assert n_bcast == 1, f"expected only customer broadcast, plan:\n{plan[:3000]}"
        # the lineitem⋈orders join must be a shuffle join on l_orderkey
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:3000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_holt_winters_single_exchange(spark):
    """The smoothing fold must stay a one-shuffle JVM aggregate: one
    Exchange (series, bucket), no window, no Python stage."""
    from gfs_to_prometheus_spark.queries import QUERIES

    q = QUERIES["holt_winters_1h"](spark, "/root/testdata/sf0.01")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan[:2000]  # shuffle (+AQE read)
    assert "Window" not in plan, plan[:2000]
    assert "Python" not in plan and "ArrowEval" not in plan, plan[:2000]


def test_absent_over_time_no_cartesian(spark):
    """The grid anti-join must be an equi-key LeftAnti (never a
    nested-loop/cartesian — that would be grid x samples at scale)."""
    from gfs_to_prometheus_spark.queries import QUERIES

    q = QUERIES["absent_over_time_1h"](spark, "/root/testdata/sf0.01")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
