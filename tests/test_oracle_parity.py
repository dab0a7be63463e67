"""Driver-gate rehearsal: every queries() entry with an oracle must match
DuckDB exactly at sf0.01 (the reference's own oracle-validation pattern,
/root/reference/README-WORKING-SOLUTION.md:63-67)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_frames


def _pairs():
    from gfs_to_prometheus_spark.queries import ORACLES, QUERIES

    return [(n, QUERIES[n], ORACLES[n]) for n in QUERIES if n in ORACLES]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, duck, name, fn, sql):
    compare_frames(fn(spark, SF_DIR), duck.sql(sql))


def test_all_queries_run_and_nonempty(spark):
    from gfs_to_prometheus_spark.queries import QUERIES

    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
