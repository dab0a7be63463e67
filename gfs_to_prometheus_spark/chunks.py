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


def _encode_payloads(
    t_all: np.ndarray, v_all: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[list, list]:
    """(ts_chunk, val_chunk) bytes per [start, end) sample run.

    1-sample runs are head-only chunks (8 B LE timestamp / 8 B LE float
    bits) by the codec definition, so they are emitted from two vectorized
    ``astype().tobytes()`` casts instead of ~1M scalar codec calls — on
    sparse tables (75k series x 30 d at sf1 => mean chunk n ~= 1.02) this
    is ~95% of all chunks. Byte-identical to dod_encode/xor_encode."""
    n = ends - starts
    ones = n == 1
    ts_chunks: list = [None] * len(starts)
    val_chunks: list = [None] * len(starts)
    idx1 = np.flatnonzero(ones)
    if len(idx1):
        tb = t_all[starts[idx1]].astype("<i8").tobytes()
        vb = v_all[starts[idx1]].astype("<f8").tobytes()
        for j, i in enumerate(idx1):
            ts_chunks[i] = tb[8 * j : 8 * j + 8]
            val_chunks[i] = vb[8 * j : 8 * j + 8]
    for i in np.flatnonzero(~ones):
        s, e = starts[i], ends[i]
        ts_chunks[i] = codecs.dod_encode(t_all[s:e])
        val_chunks[i] = codecs.xor_encode(v_all[s:e])
    return ts_chunks, val_chunks


def _decode_many(
    tcs: list, vcs: list, ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated (ts, value) samples for a batch of chunks, with the
    same vectorized head-only fast path for 1-sample chunks."""
    total = int(ns.sum())
    out_t = np.empty(total, np.int64)
    out_v = np.empty(total, np.float64)
    if not total:
        return out_t, out_v
    sample_starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
    ones = ns == 1
    idx1 = np.flatnonzero(ones)
    if len(idx1):
        out_t[sample_starts[idx1]] = np.frombuffer(
            b"".join(bytes(tcs[i])[:8] for i in idx1), "<i8"
        )
        out_v[sample_starts[idx1]] = np.frombuffer(
            b"".join(bytes(vcs[i])[:8] for i in idx1), "<f8"
        )
    for i in np.flatnonzero(~ones):
        s, n = int(sample_starts[i]), int(ns[i])
        out_t[s : s + n] = codecs.dod_decode(bytes(tcs[i]), n)
        out_v[s : s + n] = codecs.xor_decode(bytes(vcs[i]), n)
    return out_t, out_v


def _encode_pipeline(
    df: DataFrame,
    series: Sequence[str],
    ts: str,
    value: str,
    block_s: int,
    salt: int,
    max_chunk_samples: int,
):
    """Shared encode machinery: (sorted_base, keys, series_l,
    _encode_groups) — the repartition+sort prep and the per-head encode
    kernel used by both encode_chunks and roundtrip_chunks."""
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

    series_l = list(series)
    # explicit partition count = the session's configured shuffle
    # parallelism. AQE's byte-based coalescing under-parallelizes this
    # exchange: the downstream cost is python codec CPU + Arrow
    # serialization per ROW, not shuffle I/O per byte (a 30 MB
    # post-shuffle encode at sf1 coalesced to 13 tasks on 32 cores,
    # serializing the python stage; pinning the configured count measured
    # 12% off the encode wall). Scale-adaptive because shuffle.partitions
    # itself is sized to the deployment (session.py).
    n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    sorted_base = base.repartition(n_shuffle, *keys).sortWithinPartitions(
        *keys, "_ts_ms"
    )
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
        # all per-group metadata extracted vectorized; only the multi-sample
        # codec calls loop (numpy per chunk; 1-sample chunks are batched)
        ts_chunks, val_chunks = _encode_payloads(t_all, v_all, starts, ends)
        rows = {c: pdf[c].to_numpy()[starts] for c in series_l}
        rows.update(
            block_start_ms=pdf["_block"].to_numpy(np.int64)[starts],
            n=ends - starts,
            t_min_ms=t_all[starts],
            t_max_ms=t_all[ends - 1],
            ts_chunk=ts_chunks,
            val_chunk=val_chunks,
            codec=CODEC_NAME,
        )
        return pd.DataFrame(rows)

    return sorted_base, keys, series_l, _encode_groups


def _carry_batches(batches, keys, max_chunk_samples: int):
    """Yield head frames whose trailing (possibly incomplete) group is
    carried into the next Arrow batch. Groups never span partitions (hash
    repartition on the full key); they MAY span batches — this carry
    buffer re-attaches the tail. A giant trailing group is flushed as
    full chunks immediately (max_chunk_samples allows mid-group cuts),
    keeping the carry — and its per-batch re-concat — bounded."""
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
        tail_len = len(pdf) - cut
        if tail_len > max_chunk_samples:
            cut = cut + (tail_len // max_chunk_samples) * max_chunk_samples
        head, carry = pdf.iloc[:cut], pdf.iloc[cut:].copy()
        if len(head):
            yield head
    if carry is not None and len(carry):
        yield carry


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
    handled with a carry buffer (_carry_batches).

    ``max_chunk_samples`` cuts oversized groups into multiple chunk rows
    (Prometheus likewise cuts head chunks at ~120 samples): it bounds
    both chunk decode memory AND the carry buffer — a hot series' block
    with millions of samples streams through in O(batch) memory instead
    of accumulating (and re-concatenating) the whole group."""
    sorted_base, keys, series_l, _encode_groups = _encode_pipeline(
        df, series, ts, value, block_s, salt, max_chunk_samples
    )
    out_schema = f"{_series_schema(df, series)}, {CHUNK_FIELDS}"

    def build(batches):
        for head in _carry_batches(batches, keys, max_chunk_samples):
            yield _encode_groups(head)

    return sorted_base.mapInPandas(build, schema=out_schema)


def roundtrip_chunks(
    df: DataFrame,
    series: Sequence[str] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
    block_s: int = 7200,
    salt: int = 1,
    max_chunk_samples: int = 4096,
) -> DataFrame:
    """decode_chunks(encode_chunks(df)) fused into ONE Python crossing.

    The unfused pair materializes every chunk row as JVM rows between two
    mapInPandas stages: encode's output (series keys + binary payloads)
    crosses Python->JVM over Arrow only so decode can pull it JVM->Python
    right back — two full serializations of the chunk table that exist
    for no consumer (guide §4: eliminate boundary crossings). Here the
    same _encode_groups kernel runs per head batch and its output is
    decoded IN PLACE with the same _decode_many kernel, so results are
    bit-identical to the unfused pair by construction (pinned by
    tests/test_skew.py::test_roundtrip_chunks_matches_unfused_pair);
    the encode->decode codec work itself is unchanged — every sample
    still round-trips the DoD/Gorilla wire bytes."""
    sorted_base, keys, series_l, _encode_groups = _encode_pipeline(
        df, series, ts, value, block_s, salt, max_chunk_samples
    )
    out_schema = f"{_series_schema(df, series)}, ts_ms bigint, value double"

    def build(batches):
        for head in _carry_batches(batches, keys, max_chunk_samples):
            enc = _encode_groups(head)
            ns = enc["n"].to_numpy(np.int64)
            t, v = _decode_many(
                enc["ts_chunk"].tolist(), enc["val_chunk"].tolist(), ns
            )
            d = {c: np.repeat(enc[c].to_numpy(), ns) for c in series_l}
            d["ts_ms"] = t
            d["value"] = v
            yield pd.DataFrame(d)

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
            t, v = _decode_many(
                pdf["ts_chunk"].tolist(), pdf["val_chunk"].tolist(), ns
            )
            d = {c: np.repeat(pdf[c].to_numpy(), ns) for c in series_l}
            d["ts_ms"] = t
            d["value"] = v
            yield pd.DataFrame(d)

    return chunks.mapInPandas(expand, schema=out_schema)


def recode_chunks(
    chunks_df: DataFrame,
    series: Sequence[str] = ("event_type",),
    block_s: int = 86_400,
    max_chunk_samples: int = 4096,
    partition_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """chunk rows -> chunk rows at ``block_s``, shuffling ENCODED chunks.

    The decode->encode pair (decode_chunks + encode_chunks) shuffles the
    DECODED samples and crosses the JVM<->Python boundary twice. Here the
    shuffle moves the compressed chunk rows instead (at a healthy 120-
    sample chunk density that is ~1/100 the rows and a fraction of the
    bytes — the guide-§8 "move the compact proxy, not the payload" rule),
    and decode + re-encode happen in ONE mapInPandas pass, so samples
    never exist as JVM rows at all.

    PRECONDITION: every source chunk must nest inside one target block
    (floor(block_start_ms/step) == floor(t_max_ms/step)); the caller
    checks this on its stats scan (jobs/compact.py) and falls back to the
    sample-level pair otherwise. A per-group assert repeats the check.

    ``partition_col``/``num_partitions``: optional file-layout partitioning
    — a hash repartition on that column alone. The caller maps its task
    index through the murmur3 probe table (jobs/compact.py) so distinct
    values land in distinct tasks with no collision day-mixing (ADVICE
    r5) and no range-exchange sampling pass. The column must be constant
    per (series, target-block) group so groups stay intact. Default:
    hash on (series, block).

    Memory: one buffered group = one (series, target-block)'s chunk rows
    plus its decoded samples — bounded by cadence x block span (the same
    bound decode+encode pays per group), not by partition size.
    """
    step_ms = block_s * 1000
    series_l = list(series)
    nb = (F.floor(F.col("block_start_ms") / F.lit(step_ms)) * step_ms).cast(
        "long"
    )
    cols = [*series_l, "block_start_ms", "n", "ts_chunk", "val_chunk"]
    base = chunks_df.select(
        *cols, nb.alias("_nb"),
        *( [F.col(partition_col)] if partition_col else [] ),
    )
    if partition_col:
        rep = base.repartition(num_partitions, F.col(partition_col))
    else:
        rep = (
            base.repartition(num_partitions, *series_l, "_nb")
            if num_partitions
            else base.repartition(*series_l, "_nb")
        )
    rep = rep.sortWithinPartitions(*series_l, "_nb", "block_start_ms")
    keys = [*series_l, "_nb"]
    out_schema = f"{_series_schema(chunks_df, series_l)}, {CHUNK_FIELDS}"

    def _recode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        ns = pdf["n"].to_numpy(np.int64)
        t_all, v_all = _decode_many(
            pdf["ts_chunk"].tolist(), pdf["val_chunk"].tolist(), ns
        )
        gid = pdf[keys].ne(pdf[keys].shift()).any(axis=1).to_numpy().cumsum()
        row_starts = np.flatnonzero(np.diff(gid, prepend=gid[0] - 1))
        # samples per group -> group sample offsets
        gn = np.add.reduceat(ns, row_starts) if len(ns) else np.empty(0, np.int64)
        g_samples = np.repeat(np.arange(len(row_starts)), gn)
        # stable per-group time sort (source chunks of one block may
        # interleave when the source was salt-split)
        order = np.lexsort((t_all, g_samples))
        t_all, v_all = t_all[order], v_all[order]
        ends_g = np.cumsum(gn)
        starts_g = ends_g - gn
        nb_rows = pdf["_nb"].to_numpy(np.int64)[row_starts]
        if len(starts_g):
            # nesting assert: the group's sample range must lie in its block
            lo = t_all[starts_g]
            hi = t_all[ends_g - 1]
            if ((lo < nb_rows) | (hi >= nb_rows + step_ms)).any():
                raise ValueError(
                    "recode_chunks: source chunk crosses a target block "
                    "boundary; use decode_chunks + encode_chunks instead"
                )
        starts, ends = starts_g, ends_g
        if len(starts) and int((ends - starts).max()) > max_chunk_samples:
            s2, e2 = [], []
            for s, e in zip(starts, ends):
                for c in range(s, e, max_chunk_samples):
                    s2.append(c)
                    e2.append(min(c + max_chunk_samples, e))
            starts = np.array(s2, dtype=np.int64)
            ends = np.array(e2, dtype=np.int64)
        # map each output chunk back to its group's metadata rows
        out_g = np.searchsorted(starts_g, starts, side="right") - 1
        src_rows = row_starts[out_g]
        ts_chunks, val_chunks = _encode_payloads(t_all, v_all, starts, ends)
        rows = {c: pdf[c].to_numpy()[src_rows] for c in series_l}
        rows.update(
            block_start_ms=nb_rows[out_g],
            n=ends - starts,
            t_min_ms=t_all[starts],
            t_max_ms=t_all[ends - 1],
            ts_chunk=ts_chunks,
            val_chunk=val_chunks,
            codec=CODEC_NAME,
        )
        return pd.DataFrame(rows)

    def fused(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = pdf[keys].iloc[-1]
            tail_mask = (pdf[keys] == last_key).all(axis=1).to_numpy()
            cut = len(pdf) - int(
                np.argmin(tail_mask[::-1]) if not tail_mask.all() else len(pdf)
            )
            head, carry = pdf.iloc[:cut], pdf.iloc[cut:].copy()
            if len(head):
                yield _recode_groups(head)
        if carry is not None and len(carry):
            yield _recode_groups(carry)

    return rep.mapInPandas(fused, schema=out_schema)
