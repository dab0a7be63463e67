"""Custom stateful streaming operator: the per-series "head" — the
in-memory latest-sample state the reference's TSDB maintains before
cutting chunks (/root/reference/internal/tsdb/writer.go head/WAL).

Implemented with ``applyInPandasWithState``: per series_key the state
holds (last_ts_ms, last_value, n_seen, sum_micro). Every micro-batch
emits the updated head row per touched series — the streaming analog of
``rollup.rollup``'s (last, last_ts_ms, cnt, sum_micro) columns, with
exactly-once state durability via the checkpoint (the reference loses
its head on crash and replays the WAL; Spark's state store IS the WAL).

Late samples (older than the stored last_ts_ms) update the aggregates
but not `last` — the same at-or-before semantics as rollup_merge.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_ts_ms long, last_value double, n_seen long, sum_micro long"
OUTPUT_SCHEMA = (
    "series_key string, last_ts_ms long, last_value double, "
    "n_seen long, sum_micro long"
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    if state.exists:
        last_ts, last_val, n_seen, sum_micro = state.get
    else:
        last_ts, last_val, n_seen, sum_micro = -1, float("nan"), 0, 0
    for pdf in pdfs:
        ts = pdf["ts_ms"].to_numpy(np.int64)
        vals = pdf["value"].to_numpy(np.float64)
        n_seen += len(ts)
        sum_micro += int(np.floor(vals * 1000000.0 + 0.5).astype(np.int64).sum())
        i = int(ts.argmax())
        if ts[i] > last_ts:
            last_ts, last_val = int(ts[i]), float(vals[i])
    state.update((last_ts, last_val, n_seen, sum_micro))
    yield pd.DataFrame(
        {
            "series_key": [key[0]],
            "last_ts_ms": [last_ts],
            "last_value": [last_val],
            "n_seen": [n_seen],
            "sum_micro": [sum_micro],
        }
    )


def head_updates(stream: DataFrame) -> DataFrame:
    """stream (series_key string, ts_ms long, value double) ->
    per-batch head updates, state kept across micro-batches/restarts."""
    return (
        stream.groupBy("series_key")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
