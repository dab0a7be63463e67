"""GFS-archive-style binary source (S1/D1/D2/D4/D5 input-path parity).

The reference streams `.gfs` archives: readUTF'd names
(internal/gfs/statarchive.go:269-294), delta-encoded timestamps
(statarchive.go:296-316) and compact-encoded values per sparse sample
record. Our engine's input is a table (per BASELINE.json input_hint), so
this module exists to prove input-FORMAT parity, not as the primary
scan: it packs per-series sample streams into the reference's wire
encodings and decodes them back inside vectorized Arrow-batched UDFs —
the Spark analog of the reference's parser loop, with the JVM<->Python
Arrow boundary standing in for its Java-process boundary
(java_extractor.go:56-57).

Record layout (one binary record per series — a carry buffer merges
groups that span Arrow batches):

  [u16 BE name_len][modified-UTF8 series name]      <- Java writeUTF form
  [compact n][compact ts deltas][compact values]    <- Geode compact ints

Timestamp deltas use the reference's wire form: first sample's ts is a
compact int (absolute), then deltas. The series name rides INSIDE the
record, so decode genuinely exercises the modified-UTF8 path (D5) —
non-ASCII, embedded NUL, and supplementary (surrogate-pair) characters
roundtrip through the wire bytes.

Both directions are batch-vectorized: ONE compact_encode/decode call per
Arrow batch over an interleaved value stream, with record boundaries
recovered from per-record sample counts; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs


def _encode_batch(
    names: list[str], t: np.ndarray, v: np.ndarray, starts: np.ndarray,
    ends: np.ndarray,
) -> list[bytes]:
    """Vectorized: one record per (names[i], t[starts_i:ends_i], v[...])."""
    counts = (ends - starts).astype(np.int64)
    nrec = len(counts)
    # interleaved value stream: [n, deltas..., values...] per record
    vper = 1 + 2 * counts
    voff = np.concatenate([[0], np.cumsum(vper)])
    stream = np.empty(int(voff[-1]), dtype=np.int64)
    stream[voff[:-1]] = counts
    deltas = np.empty(len(t), dtype=np.int64)
    deltas[1:] = t[1:] - t[:-1]
    deltas[starts] = t[starts]  # first sample carries the absolute ts
    row = np.arange(len(t), dtype=np.int64)
    within = row - np.repeat(starts, counts)
    didx = np.repeat(voff[:-1] + 1, counts) + within
    stream[didx] = deltas
    stream[didx + np.repeat(counts, counts)] = v
    payload = codecs.compact_encode(stream)
    psizes = codecs.compact_sizes(stream)
    pends = np.cumsum(psizes)
    pay_off = np.concatenate([[0], pends[voff[1:] - 1]])
    nbuf, nlens = codecs.mutf8_encode_batch(names)
    if (nlens > 0xFFFF).any():
        raise ValueError("series name exceeds 65535 modified-UTF8 bytes")
    noff = np.concatenate([[0], np.cumsum(nlens)])
    pay = np.frombuffer(payload, dtype=np.uint8)
    return [
        (
            int(nlens[i]).to_bytes(2, "big")
            + nbuf[noff[i] : noff[i + 1]].tobytes()
            + pay[pay_off[i] : pay_off[i + 1]].tobytes()
        )
        for i in range(nrec)
    ]


def _decode_batch(records: list[bytes]) -> tuple:
    """-> (names per record, counts, ts_ms concat, values concat)."""
    rlens = np.fromiter((len(r) for r in records), dtype=np.int64,
                        count=len(records))
    buf = np.frombuffer(b"".join(records), dtype=np.uint8)
    roff = np.concatenate([[0], np.cumsum(rlens)])[:-1]
    nlens = (buf[roff].astype(np.int64) << 8) | buf[roff + 1].astype(np.int64)
    # gather the name bytes into one contiguous buffer (lane-free gather:
    # names are short, use repeat/arange once over total name bytes)
    tot = int(nlens.sum())
    nidx = (
        np.repeat(roff + 2, nlens)
        + np.arange(tot, dtype=np.int64)
        - np.repeat(np.cumsum(nlens) - nlens, nlens)
    )
    names = codecs.mutf8_decode_batch(buf[nidx], nlens)
    # payload region per record -> one contiguous compact stream
    pstart = roff + 2 + nlens
    pend = roff + rlens
    plens = pend - pstart
    ptot = int(plens.sum())
    pidx = (
        np.repeat(pstart, plens)
        + np.arange(ptot, dtype=np.int64)
        - np.repeat(np.cumsum(plens) - plens, plens)
    )
    stream = codecs.compact_decode(buf[pidx].tobytes())
    # record boundaries in the value stream from the embedded counts
    counts = np.empty(len(records), dtype=np.int64)
    off = 0
    offs = np.empty(len(records), dtype=np.int64)
    for i in range(len(records)):  # O(#records), not O(#samples)
        offs[i] = off
        counts[i] = stream[off]
        off += 1 + 2 * counts[i]
    row = np.arange(int(counts.sum()), dtype=np.int64)
    base = np.cumsum(counts) - counts
    within = row - np.repeat(base, counts)
    didx = np.repeat(offs + 1, counts) + within
    deltas = stream[didx]
    vals = stream[didx + np.repeat(counts, counts)]
    # segmented cumsum: per-record running sum of deltas
    csum = np.cumsum(deltas)
    first = csum[base] - deltas[base]
    ts = csum - np.repeat(first, counts)
    return names, counts, ts, vals


def encode_archive(
    df: DataFrame, series: str = "series_key", ts_ms: str = "ts_ms",
    value_long: str = "value_long",
) -> DataFrame:
    """(series, ts_ms, value_long) -> (series, n, record binary).

    One record per series per partition: groups are hash-repartitioned on
    the series key and a carry buffer (same pattern as
    chunks.encode_chunks) merges groups that span Arrow batches, so the
    'one binary record per series' contract holds regardless of Arrow
    batch size."""
    out_schema = f"{series} string, n bigint, record binary"

    def _flush(pdf: pd.DataFrame):
        gid = pdf[series].ne(pdf[series].shift()).to_numpy().cumsum()
        starts = np.flatnonzero(np.diff(gid, prepend=gid[0] - 1))
        ends = np.append(starts[1:], len(pdf))
        t = pdf[ts_ms].to_numpy(np.int64)
        v = pdf[value_long].to_numpy(np.int64)
        names = [pdf[series].iloc[s] for s in starts]
        return pd.DataFrame(
            {
                series: names,
                "n": ends - starts,
                "record": _encode_batch(names, t, v, starts, ends),
            }
        )

    def enc(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf[series].iloc[-1]
            tail = (pdf[series] == last).to_numpy()
            cut = len(pdf) - int(
                np.argmin(tail[::-1]) if not tail.all() else len(pdf)
            )
            head, carry = pdf.iloc[:cut], pdf.iloc[cut:].copy()
            if len(head):
                yield _flush(head)
        if carry is not None and len(carry):
            yield _flush(carry)

    return (
        df.repartition(series)
        .sortWithinPartitions(series, ts_ms)
        .mapInPandas(enc, out_schema)
    )


def decode_archive(
    archive: DataFrame, series: str = "series_key",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(series?, n, record, extra...) -> (series, [extras...], ts_ms,
    value_long).

    The series name is read from the record's modified-UTF8 header (the
    separate column, if present, is ignored) — the inverse of the
    reference's readUTF + delta/compact parse, batch-vectorized.
    `passthrough` columns (e.g. path-derived node labels) are repeated
    onto every decoded sample of their record."""
    extra = list(passthrough or [])
    by_name = {f.name: f.dataType.simpleString() for f in archive.schema.fields}
    extra_schema = "".join(f", {c} {by_name[c]}" for c in extra)
    out_schema = (
        f"{series} string{extra_schema}, ts_ms bigint, value_long bigint"
    )

    def dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            records = [bytes(r) for r in pdf["record"]]
            names, counts, ts, vals = _decode_batch(records)
            d = {series: np.repeat(np.array(names, dtype=object), counts)}
            for c in extra:
                d[c] = np.repeat(pdf[c].to_numpy(), counts)
            d["ts_ms"] = ts
            d["value_long"] = vals
            yield pd.DataFrame(d)

    return archive.mapInPandas(dec, out_schema)
