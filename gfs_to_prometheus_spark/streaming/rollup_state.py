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

Scale: state size = active (series, bucket) pairs. WITHOUT a watermark
the state store grows by one entry per closed bucket forever; pass
``watermark_delay`` to bound it — the input gets an event-time watermark
(which also drops samples later than the delay, exactly Prometheus's
out-of-order policy: route older data through the batch MERGE path,
late.py) and each bucket's state registers an event-time timeout at
bucket_end + delay, after which it is REMOVED. Eviction + the watermark
are a matched pair: the watermark guarantees no sample for an evicted
bucket can arrive afterwards, so an evicted bucket can never be
partially re-opened (which would emit undercounted aggregates).
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


def _make_update(step_ms: int, delay_ms: int | None):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed bucket_end + delay: no more samples for
            # this bucket can arrive -> free the state slot
            state.remove()
            return
        if delay_ms is not None:
            # applyInPandasWithState does NOT pre-filter late rows by the
            # watermark — a straggler for an already-finalized (evicted)
            # bucket would re-open it with partial aggregates and emit an
            # undercounted upsert. Enforce the drop here: once the
            # watermark passes this bucket's finalization point, its
            # samples route to the batch MERGE path (late.py) instead.
            finalize_at = int(key[1]) + step_ms + delay_ms
            if finalize_at <= state.getCurrentWatermarkMs():
                return
        yield from _merge_batch(key, pdfs, state)
        if delay_ms is not None and state.exists:
            state.setTimeoutTimestamp(int(key[1]) + step_ms + delay_ms)

    return _update


def _merge_batch(
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


_DELAY_UNITS_MS = {
    "microsecond": 0.001, "millisecond": 1, "second": 1_000,
    "minute": 60_000, "hour": 3_600_000, "day": 86_400_000,
    "week": 604_800_000,
}


def _delay_ms(delay: str) -> int:
    """Parse the Spark interval forms withWatermark accepts ("10 minutes",
    "1 week", "500 milliseconds", any case, optional plural) — a delay the
    watermark accepts but this raised on would crash the stream instead of
    bounding its state."""
    try:
        n, unit = delay.strip().split()
        ms = float(n) * _DELAY_UNITS_MS[unit.lower().rstrip("s")]
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"unsupported watermark_delay {delay!r}: expected '<n> "
            f"<{'|'.join(_DELAY_UNITS_MS)}[s]>'"
        ) from e
    return int(ms)


def rollup_stream(
    stream: DataFrame,
    step_s: int = 300,
    watermark_delay: str | None = None,
) -> DataFrame:
    """stream (series_key string, ts_ms long, value double) -> per-batch
    updated (series, bucket) rollup rows; state survives restarts.

    ``watermark_delay`` (e.g. "10 minutes") bounds the state store: see
    the module docstring for the eviction/late-drop contract. Without it
    state grows with every closed bucket (acceptable for bounded tests,
    not for a long-running watch job)."""
    step_ms = step_s * 1000
    delay_ms = None
    if watermark_delay is not None:
        stream = stream.withColumn(
            "_event_time", F.timestamp_millis(F.col("ts_ms"))
        ).withWatermark("_event_time", watermark_delay)
        delay_ms = _delay_ms(watermark_delay)
    bucket = (F.floor(F.col("ts_ms") / F.lit(step_ms)) * step_ms).cast(
        "long"
    )
    return (
        stream.withColumn("bucket_ms", bucket)
        .groupBy("series_key", "bucket_ms")
        .applyInPandasWithState(
            _make_update(step_ms, delay_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if watermark_delay is None
                else GroupStateTimeout.EventTimeTimeout
            ),
        )
    )
