from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="session")
def spark():
    from gfs_to_prometheus_spark.session import get_spark

    s = get_spark(app="tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def compare_frames(spark_df, duck_rel, float_rtol: float = 0.0):
    """Mimic the driver's check: row count, column-name-sorted,
    order-insensitive exact value comparison."""
    import pandas as pd

    a = spark_df.toPandas()
    b = duck_rel.df()
    assert sorted(a.columns) == sorted(b.columns), (
        f"schema mismatch: {sorted(a.columns)} vs {sorted(b.columns)}"
    )
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols, ignore_index=True)
    b = b[cols].sort_values(cols, ignore_index=True)
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    # the driver hashes rendered values, so int-vs-float drift (e.g. DuckDB
    # HUGEINT -> float64) must fail here even when values are numerically equal
    ka = [a[c].dtype.kind for c in cols]
    kb = [b[c].dtype.kind for c in cols]
    assert ka == kb, f"dtype-kind mismatch: {list(zip(cols, ka, kb))}"
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=(float_rtol == 0.0),
        rtol=float_rtol,
    )
