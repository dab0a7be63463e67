"""Operator cache pool: plan-keyed dedupe (re-registration must refresh,
not duplicate — a duplicate's eviction would unpersist the SHARED cache
entry) and bounded LRU eviction."""

from __future__ import annotations

from pyspark.sql import functions as F

from gfs_to_prometheus_spark.operators import cachereg


def _fresh():
    cachereg.release()
    assert not cachereg._LIVE


def test_plan_equal_frames_share_one_slot(spark):
    _fresh()
    a = cachereg.cached(spark.range(10).select((F.col("id") * 2).alias("x")))
    b = cachereg.cached(spark.range(10).select((F.col("id") * 2).alias("x")))
    assert len(cachereg._LIVE) == 1
    assert a.count() == b.count() == 10
    cachereg.release()


def test_lru_eviction_bounds_pool(spark):
    _fresh()
    old_max = cachereg.MAX_LIVE
    cachereg.MAX_LIVE = 3
    try:
        frames = [
            cachereg.cached(
                spark.range(5).select((F.col("id") + k).alias("x"))
            )
            for k in range(5)
        ]
        assert len(cachereg._LIVE) == 3
        # newest three survive; all frames still EXECUTE correctly
        # (eviction only drops the cache, never correctness)
        assert [f.count() for f in frames] == [5] * 5
        storage = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        assert len(storage) <= 3 + 1  # pool bound (+1 for async cleanup lag)
    finally:
        cachereg.MAX_LIVE = old_max
        cachereg.release()


def test_release_empties_pool(spark):
    _fresh()
    cachereg.cached(spark.range(3).select(F.col("id").alias("y")), eager=True)
    assert len(cachereg._LIVE) == 1
    cachereg.release()
    assert not cachereg._LIVE


def test_poisoned_unpersist_surfaces_warning():
    """ADVICE r5: a failing unpersist during eviction must increment the
    failure counter and warn once, never silently pass."""
    import warnings

    class _Poisoned:
        def unpersist(self):
            raise RuntimeError("py4j drift")

    before = cachereg.EVICT_FAIL_COUNT
    cachereg.EVICT_FAIL_COUNT = 0
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cachereg._evict(_Poisoned())
            cachereg._evict(_Poisoned())
        assert cachereg.EVICT_FAIL_COUNT == 2
        assert sum("cachereg" in str(x.message) for x in w) == 1  # once
    finally:
        cachereg.EVICT_FAIL_COUNT = before
