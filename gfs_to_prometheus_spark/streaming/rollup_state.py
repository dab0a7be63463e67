"""Streaming rollup tier (A9 x ST): the 5m/any-step rollup maintained as
stateful streaming aggregates — the live counterpart of ``rollup.rollup``,
the way the reference's watch mode keeps its TSDB head current while the
batch path backfills (cmd/gfs-to-prometheus/main.go watch lifecycle;
internal/tsdb/writer.go head).

Keyed by (series_key, bucket_ms): the state carries exactly the tier's
merge-closed aggregate set (vmin, vmax, sum_micro, cnt, last, last_ts_ms),
so merging a micro-batch into state is the SAME associative merge as
``rollup.rollup_merge`` — which is what makes the equivalence law hold:

    latest emitted row per (series, bucket) over ANY split of the input
    into micro-batches == rollup.rollup(whole input)   (tested, incl.
    across a query restart — the state store carries the partials).

sum_micro stays integer (micro-scaled), so streaming merge order cannot
perturb float sums; ``last`` merges via the carried last_ts_ms exactly as
rollup_merge does. Emission is outputMode=update (one row per TOUCHED
bucket per micro-batch) — the sink upserts by (series, bucket), the same
contract as the late-data MERGE path (late.py).

Scale: state size = active (series, bucket) pairs, i.e. the series
cardinality times the handful of open buckets — the watermark closes
buckets; completed buckets stop being touched and cost nothing per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "vmin double, vmax double, sum_micro long, cnt long, "
    "last double, last_ts_ms long"
)
OUTPUT_SCHEMA = (
    "series_key string, bucket_ms long, vmin double, vmax double, "
    "sum_micro long, cnt long, last double, last_ts_ms long"
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # one group's micro-batch arrives as MULTIPLE Arrow chunks with no
    # cross-chunk ordering — materialize before the scan (same rule as
    # sparse_state; aggregates here are order-free except `last`, which
    # needs the global argmax, not a per-chunk one)
    parts = [pdf for pdf in pdfs if len(pdf)]
    if parts:
        batch = pd.concat(parts, ignore_index=True)
        ts = batch["ts_ms"].to_numpy(np.int64)
        vals = batch["value"].to_numpy(np.float64)
        b_sum = int(np.floor(vals * 1000000.0 + 0.5).astype(np.int64).sum())
        i = int(ts.argmax())  # ts unique per series in our sources
        if state.exists:
            vmin, vmax, sum_micro, cnt, last, last_ts = state.get
            vmin = min(vmin, float(vals.min()))
            vmax = max(vmax, float(vals.max()))
            sum_micro += b_sum
            cnt += len(ts)
            if int(ts[i]) > last_ts:
                last, last_ts = float(vals[i]), int(ts[i])
        else:
            vmin, vmax = float(vals.min()), float(vals.max())
            sum_micro, cnt = b_sum, len(ts)
            last, last_ts = float(vals[i]), int(ts[i])
        state.update((vmin, vmax, sum_micro, cnt, last, last_ts))
        yield pd.DataFrame(
            {
                "series_key": [key[0]],
                "bucket_ms": [int(key[1])],
                "vmin": [vmin],
                "vmax": [vmax],
                "sum_micro": [sum_micro],
                "cnt": [cnt],
                "last": [last],
                "last_ts_ms": [last_ts],
            }
        )


def rollup_stream(stream: DataFrame, step_s: int = 300) -> DataFrame:
    """stream (series_key string, ts_ms long, value double) -> per-batch
    updated (series, bucket) rollup rows; state survives restarts."""
    step_ms = step_s * 1000
    bucket = (F.floor(F.col("ts_ms") / F.lit(step_ms)) * step_ms).cast(
        "long"
    )
    return (
        stream.withColumn("bucket_ms", bucket)
        .groupBy("series_key", "bucket_ms")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
