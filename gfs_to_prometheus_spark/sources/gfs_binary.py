"""GFS-archive-style binary source (S1/D1/D2/D4 input-path parity).

The reference streams `.gfs` archives: delta-encoded timestamps
(internal/gfs/statarchive.go:296-316) and Geode compact-encoded values
(statarchive.go:1034-1088) per sparse sample record. Our engine's input
is a table (per BASELINE.json input_hint), so this module exists to prove
input-FORMAT parity, not as the primary scan: it packs per-series sample
streams into the reference's wire encodings and decodes them back inside
vectorized pandas UDFs — the Spark analog of the reference's parser loop,
with the JVM<->Python Arrow boundary standing in for its Java-process
boundary (java_extractor.go:56-57).

encode_archive:  (series, ts_ms, value_long) -> one binary record per
                 series: [compact n] [delta-encoded ts bytes] [compact values]
decode_archive:  the inverse, exploding back to samples.

Timestamp deltas use the reference's wire form: first sample's ts is a
compact int (absolute), then deltas; values use the Geode compact form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs


def _encode_stream(ts_ms: np.ndarray, vals: np.ndarray) -> bytes:
    ts = np.asarray(ts_ms, dtype=np.int64)
    deltas = np.empty(len(ts), dtype=np.int64)
    if len(ts):
        deltas[0] = ts[0]
        deltas[1:] = np.diff(ts)
    return (
        codecs.compact_encode(np.array([len(ts)], dtype=np.int64))
        + codecs.compact_encode(deltas)
        + codecs.compact_encode(np.asarray(vals, dtype=np.int64))
    )


def _decode_stream(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    all_vals = codecs.compact_decode(buf)
    n = int(all_vals[0])
    deltas = all_vals[1 : 1 + n]
    vals = all_vals[1 + n : 1 + 2 * n]
    return np.cumsum(deltas), vals


def encode_archive(
    df: DataFrame, series: str = "series_key", ts_ms: str = "ts_ms",
    value_long: str = "value_long",
) -> DataFrame:
    """(series, ts_ms, value_long) -> (series, n, record binary)."""
    out_schema = f"{series} string, n bigint, record binary"

    def enc(batches):
        for pdf in batches:
            pdf = pdf.sort_values([series, ts_ms], kind="mergesort")
            gid = pdf[series].ne(pdf[series].shift()).to_numpy().cumsum()
            starts = np.flatnonzero(np.diff(gid, prepend=gid[0] - 1))
            ends = np.append(starts[1:], len(pdf))
            t = pdf[ts_ms].to_numpy(np.int64)
            v = pdf[value_long].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    series: [pdf[series].iloc[s] for s in starts],
                    "n": [e - s for s, e in zip(starts, ends)],
                    "record": [
                        _encode_stream(t[s:e], v[s:e])
                        for s, e in zip(starts, ends)
                    ],
                }
            )

    return (
        df.repartition(series)
        .sortWithinPartitions(series, ts_ms)
        .mapInPandas(enc, out_schema)
    )


def decode_archive(
    archive: DataFrame, series: str = "series_key"
) -> DataFrame:
    """(series, n, record) -> (series, ts_ms, value_long)."""
    out_schema = f"{series} string, ts_ms bigint, value_long bigint"

    def dec(batches):
        for pdf in batches:
            keys, tss, vss = [], [], []
            for _, r in pdf.iterrows():
                t, v = _decode_stream(bytes(r["record"]))
                keys.append(np.repeat(r[series], len(t)))
                tss.append(t)
                vss.append(v)
            if keys:
                yield pd.DataFrame(
                    {
                        series: np.concatenate(keys),
                        "ts_ms": np.concatenate(tss),
                        "value_long": np.concatenate(vss),
                    }
                )

    return archive.mapInPandas(dec, out_schema)
