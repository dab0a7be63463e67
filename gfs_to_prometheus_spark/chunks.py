"""Per-series chunk materialization — the TSDB-block analog (S8, §2.11).

The reference appends per-series samples into Prometheus TSDB 2h blocks
(Gorilla chunks, /root/reference/internal/tsdb/writer.go:29-34). Here a
chunk row is built per (series, tumbling block) by a grouped vectorized
pandas UDF over the numpy codecs:

    (series..., block_start_ms, n, t_min_ms, t_max_ms,
     ts_chunk: binary, val_chunk: binary, codec: string)

Scale design
------------
* The applyInPandas group key is (series, block): a hot series is already
  split across time blocks, bounding group size by cadence x block span.
* For blocks that are STILL hot (FIXTURES.md: 1% of series carry 50% of
  samples), pass ``salt > 1``: a deterministic pmod(xxhash64(ts), salt)
  sub-key splits one block into `salt` chunks. Readers are oblivious —
  decode just yields more chunk rows. This is the explicit skew control
  the north_rule demands (AQE cannot split a single pandas-UDF group).
* Chunks land partitioned by block day -> retention (retention.py) is a
  metadata-only partition drop, mirroring writer.go:27's 365d horizon.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import codecs
from .timeutil import epoch_ms

CODEC_NAME = "dod+gorilla-v2"  # section-split: vectorized decode (codecs.py)

CHUNK_FIELDS = (
    "block_start_ms bigint, n bigint, t_min_ms bigint, t_max_ms bigint, "
    "ts_chunk binary, val_chunk binary, codec string"
)


def _series_schema(df: DataFrame, series: Sequence[str]) -> str:
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{c} {by_name[c]}" for c in series)


def encode_chunks(
    df: DataFrame,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
    block_s: int = 7200,
    salt: int = 1,
    max_chunk_samples: int = 4096,
) -> DataFrame:
    """samples -> chunk rows. One shuffle on (series, block[, salt]).

    Implementation: repartition+sortWithinPartitions, then mapInPandas
    with manual group detection — one Arrow exchange per 64k-row batch
    instead of per group (applyInPandas pays per-group overhead, which
    dominates when chunks are small). Groups never span partitions
    (hash repartition on the full key); groups MAY span Arrow batches,
    handled with a carry buffer.

    ``max_chunk_samples`` cuts oversized groups into multiple chunk rows
    (Prometheus likewise cuts head chunks at ~120 samples): it bounds
    both chunk decode memory AND the carry buffer — a hot series' block
    with millions of samples streams through in O(batch) memory instead
    of accumulating (and re-concatenating) the whole group."""
    step_ms = block_s * 1000
    base = df.select(
        *series,
        epoch_ms(ts).alias("_ts_ms"),
        F.col(value).cast("double").alias("_val"),
    ).withColumn(
        "_block", (F.floor(F.col("_ts_ms") / F.lit(step_ms)) * step_ms).cast("long")
    )
    keys = [*series, "_block"]
    if salt > 1:
        # int32, not int64: the salt is pure partitioning ballast that also
        # crosses the JVM->Python Arrow pipe — half the bytes, same split
        base = base.withColumn(
            "_salt", F.pmod(F.xxhash64("_ts_ms"), F.lit(salt)).cast("int")
        )
        keys.append("_salt")

    out_schema = f"{_series_schema(df, series)}, {CHUNK_FIELDS}"
    series_l = list(series)
    sorted_base = base.repartition(*keys).sortWithinPartitions(*keys, "_ts_ms")
    # Pipe-volume note (measured, BENCH/pipe_bytes.py + r4 A/B): dropping
    # _block from the Arrow pipe and recomputing it python-side cuts the
    # JVM->Python bytes 27% (44.5 -> 32.5 B/row) but makes the END-TO-END
    # write path ~20% SLOWER at 4x2 executors — the pandas column insert +
    # block-manager consolidation in the group scan costs more than the
    # pipe transfer saves. The pipe is NOT the binding constraint at this
    # byte range; python-side codec CPU is. So _block ships; only the salt
    # is shrunk to i32 (no python-side rebuild needed for that one).

    def _encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        t_all = pdf["_ts_ms"].to_numpy(np.int64)
        v_all = pdf["_val"].to_numpy(np.float64)
        gid = (
            pdf[keys].ne(pdf[keys].shift()).any(axis=1).to_numpy().cumsum()
        )
        starts = np.flatnonzero(np.diff(gid, prepend=gid[0] - 1))
        ends = np.append(starts[1:], len(pdf))
        if int((ends - starts).max()) > max_chunk_samples:
            # subdivide oversized groups into <=max_chunk_samples chunks
            s2, e2 = [], []
            for s, e in zip(starts, ends):
                for c in range(s, e, max_chunk_samples):
                    s2.append(c)
                    e2.append(min(c + max_chunk_samples, e))
            starts = np.array(s2, dtype=np.int64)
            ends = np.array(e2, dtype=np.int64)
        # all per-group metadata extracted vectorized; only the codec calls
        # loop (numpy per chunk)
        rows = {c: pdf[c].to_numpy()[starts] for c in series_l}
        rows.update(
            block_start_ms=pdf["_block"].to_numpy(np.int64)[starts],
            n=ends - starts,
            t_min_ms=t_all[starts],
            t_max_ms=t_all[ends - 1],
            ts_chunk=[
                codecs.dod_encode(t_all[s:e]) for s, e in zip(starts, ends)
            ],
            val_chunk=[
                codecs.xor_encode(v_all[s:e]) for s, e in zip(starts, ends)
            ],
            codec=CODEC_NAME,
        )
        return pd.DataFrame(rows)

    def build(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the trailing (possibly incomplete) group
            last_key = pdf[keys].iloc[-1]
            tail_mask = (pdf[keys] == last_key).all(axis=1).to_numpy()
            # rows of the final contiguous run with the last key
            cut = len(pdf) - int(
                np.argmin(tail_mask[::-1]) if not tail_mask.all() else len(pdf)
            )
            # a giant trailing group is flushed as full chunks immediately
            # (max_chunk_samples allows mid-group cuts), keeping the carry
            # — and its per-batch re-concat — bounded
            tail_len = len(pdf) - cut
            if tail_len > max_chunk_samples:
                full = cut + (tail_len // max_chunk_samples) * max_chunk_samples
                cut = full
            head, carry = pdf.iloc[:cut], pdf.iloc[cut:].copy()
            if len(head):
                yield _encode_groups(head)
        if carry is not None and len(carry):
            yield _encode_groups(carry)

    return sorted_base.mapInPandas(build, schema=out_schema)


def decode_chunks(
    chunks: DataFrame, series: Sequence[str] = ("event_type",)
) -> DataFrame:
    """chunk rows -> samples (series..., ts_ms, value). Narrow map — each
    chunk decodes independently (mapInPandas, no shuffle)."""
    series_l = list(series)
    out_schema = f"{_series_schema(chunks, series_l)}, ts_ms bigint, value double"

    def expand(batches):
        for pdf in batches:
            ns = pdf["n"].to_numpy(np.int64)
            tcs = pdf["ts_chunk"].tolist()
            vcs = pdf["val_chunk"].tolist()
            t = np.concatenate(
                [codecs.dod_decode(bytes(b), int(n)) for b, n in zip(tcs, ns)]
            ) if len(ns) else np.empty(0, np.int64)
            v = np.concatenate(
                [codecs.xor_decode(bytes(b), int(n)) for b, n in zip(vcs, ns)]
            ) if len(ns) else np.empty(0, np.float64)
            d = {c: np.repeat(pdf[c].to_numpy(), ns) for c in series_l}
            d["ts_ms"] = t
            d["value"] = v
            yield pd.DataFrame(d)

    return chunks.mapInPandas(expand, schema=out_schema)
