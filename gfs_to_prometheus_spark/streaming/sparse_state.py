"""Streaming change-point encoder (F6 x ST): the stateful analog of
``gapfill.sparse_encode`` — emit a sample only when its value differs
from the series' previous sample, with the previous sample carried
across micro-batches AND query restarts in the state store.

This is the reference's only-changed-stats WRITE path as a stream
(internal/gfs/statarchive.go:647-685 compares each stat against the
last written sample while tailing a live archive): a watcher that
re-encodes a firehose into the sparse form before sinking.

Semantics (documented divergences none — matches the batch operator):
* (series, ts) ties collapse to max(value) (same rule as batch/changes).
* A batch's samples are processed in ts order regardless of arrival
  order inside the batch.
* Samples at or before the state's last ts are LATE and dropped —
  archive streams are in-order per series; route late data through the
  batch MERGE path (late.py) instead.

Equivalence law (tested): streaming emission over any batch split of an
in-order stream == gapfill.sparse_encode of the whole input, because a
skipped sample always equals the last emitted value, so "differs from
last seen" == "differs from last emitted".
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_ts_ms long, last_value double, has_last boolean"
OUTPUT_SCHEMA = "series_key string, ts_ms long, value double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, last_val, has_last = state.get
    else:
        last_ts, last_val, has_last = -1, 0.0, False
    # applyInPandasWithState hands one group's micro-batch as MULTIPLE
    # Arrow chunks (~10k rows each) with no cross-chunk ts ordering after
    # the shuffle; per-chunk processing would drop a later chunk's earlier
    # timestamps as "late" and miss ties split across chunks. Materialize
    # the whole micro-batch (state stays O(1); a micro-batch per series is
    # bounded by trigger interval x ingest rate) and scan once.
    parts = [pdf for pdf in pdfs if len(pdf)]
    batch = pd.concat(parts, ignore_index=True) if parts else None
    if batch is not None:
        # ts-tie dedup to max(value), then ts order (batch-operator rule)
        g = batch.groupby("ts_ms", as_index=False)["value"].max().sort_values(
            "ts_ms"
        )
        ts = g["ts_ms"].to_numpy(np.int64)
        vals = g["value"].to_numpy(np.float64)
        live = ts > last_ts  # late samples: dropped (see module doc)
        ts, vals = ts[live], vals[live]
        if len(ts):
            prev = np.concatenate(
                [[last_val if has_last else np.nan], vals[:-1]]
            )
            emit = vals != prev  # NaN != x is True -> first sample emits
            if has_last is False:
                emit[0] = True
            if emit.any():
                yield pd.DataFrame(
                    {
                        "series_key": key[0],
                        "ts_ms": ts[emit],
                        "value": vals[emit],
                    }
                )
            last_ts, last_val, has_last = int(ts[-1]), float(vals[-1]), True
    state.update((last_ts, last_val, has_last))


def sparse_encode_stream(stream: DataFrame) -> DataFrame:
    """stream (series_key string, ts_ms long, value double) -> the
    change-point substream, exactly-once across restarts."""
    return stream.groupBy("series_key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
