"""Multimodal columns: image/audio/video as opaque ``binary`` payloads +
typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

Decode is REAL, in pure numpy, for three public fixed-layout formats:

* image — PPM ``P6`` (netpbm): text header ``P6 <w> <h> <maxval>`` with
  ``#`` comments, then ``w*h*3`` raw RGB bytes.
* audio — WAV (RIFF) PCM signed 16-bit LE: chunk walk over ``fmt `` /
  ``data`` (not a fixed 44-byte assumption).
* video — YUV4MPEG2 (y4m) with C444 packing: text stream header, then
  per-frame ``FRAME\\n`` + ``w*h*3`` bytes.

Encoders for the same formats exist so tests and queries() entries can
round-trip real bytes: the fixtures carry genuine format headers, and a
broken offset/endianness/header parse shows up as an oracle mismatch,
not a silently-agreeing fake.

Scale notes: payloads never pass through a shuffle — every transform is
a narrow ``mapInPandas``; only the (small) extracted features are
grouped or joined downstream. At 100 TB keep payloads in their own
parquet column chunk so feature queries prune them at the scan. Batches
iterate via ``zip`` over column arrays (``iterrows`` pays ~10x per-row
Series construction overhead).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int, mime string"
)

# ---------------------------------------------------------------------------
# Pure-numpy codecs for public formats
# ---------------------------------------------------------------------------


def encode_ppm(rgb: np.ndarray) -> bytes:
    """netpbm P6: ``P6\\n<w> <h>\\n255\\n`` + raw RGB rows."""
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError(f"P6 wants 3 channels, got {c}")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        rgb.astype(np.uint8)
    ).tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse P6: magic, then 3 whitespace-separated header ints with
    ``#``-comment support, then exactly one whitespace byte, then pixels.
    Returns (width, height, uint8[h, w, 3])."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    n = w * h * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return w, h, px.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Canonical RIFF/WAVE, PCM s16le mono."""
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF chunk walk (fmt then data, other chunks skipped). Returns
    (sample_rate, int16 samples). PCM s16 mono only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, bits, channels = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = pos + 8
        if cid == b"fmt ":
            # bounds-check before unpack: a truncated fmt chunk must hit the
            # documented ValueError contract, not struct.error
            if body + 16 > len(payload):
                raise ValueError("truncated fmt chunk")
            fmt, channels, rate = struct.unpack("<HHI", payload[body : body + 8])
            bits = struct.unpack("<H", payload[body + 14 : body + 16])[0]
            if fmt != 1:
                raise ValueError(f"only PCM supported, got format {fmt}")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            if bits != 16 or channels != 1:
                raise ValueError(f"only s16 mono supported ({bits} bit x{channels})")
            return rate, np.frombuffer(payload, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def encode_y4m(frames: np.ndarray) -> bytes:
    """YUV4MPEG2 C444 (planar, but we store packed C444 as 3 planes per
    frame in Y,U,V order — here the planes just carry our RGB channels)."""
    n, h, w, c = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (w, h)]
    f8 = frames.astype(np.uint8)
    for i in range(n):
        # planar: all of channel 0, then 1, then 2
        out.append(b"FRAME\n" + np.ascontiguousarray(f8[i].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse the y4m stream header (W/H tags) + FRAME markers. Returns
    (width, height, uint8[n, h, w, 3])."""
    nl = payload.index(b"\n")
    head = payload[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    for tag in head[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
    if not w or not h:
        raise ValueError("missing W/H tags")
    frame_bytes, pos, frames = w * h * 3, nl + 1, []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        body = fnl + 1
        planes = np.frombuffer(payload, dtype=np.uint8, count=frame_bytes, offset=body)
        frames.append(planes.reshape(3, h, w).transpose(1, 2, 0))
        pos = body + frame_bytes
    return w, h, np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)


# ---------------------------------------------------------------------------
# Deterministic real-format fixtures
# ---------------------------------------------------------------------------


def _pixels(seed: int, w: int, h: int) -> np.ndarray:
    """uint8[h, w, 3]: channel c at flat index p = (seed*131 + p*3 + c) % 256
    — closed-form enough for a SQL oracle to predict the channel sums."""
    p = np.arange(w * h, dtype=np.int64)[:, None]
    c = np.arange(3, dtype=np.int64)[None, :]
    return ((seed * 131 + p * 3 + c) % 256).astype(np.uint8).reshape(h, w, 3)


def _samples(seed: int, n: int) -> np.ndarray:
    """int16[n]: sample s = (seed*37 + s*11) % 4096 - 2048."""
    s = np.arange(n, dtype=np.int64)
    return ((seed * 37 + s * 11) % 4096 - 2048).astype(np.int16)


def _frames(seed: int, n: int, w: int, h: int) -> np.ndarray:
    """uint8[n, h, w, 3], planar byte j of frame f = (seed*17 + f*251 + j) % 256."""
    f = np.arange(n, dtype=np.int64)[:, None]
    j = np.arange(w * h * 3, dtype=np.int64)[None, :]
    planar = ((seed * 17 + f * 251 + j) % 256).astype(np.uint8)
    return planar.reshape(n, 3, h, w).transpose(0, 2, 3, 1)


def media_params(doc_id):
    """Spark Columns deriving per-doc media geometry from doc_id (the same
    arithmetic the oracle SQL uses)."""
    return {
        "width": (F.lit(4) + F.pmod(doc_id, F.lit(5))).cast("int"),
        "height": (F.lit(4) + F.pmod(doc_id, F.lit(3))).cast("int"),
        "n_samples": (F.lit(64) + F.pmod(doc_id, F.lit(64))).cast("int"),
        "n_frames": (F.lit(2) + F.pmod(doc_id, F.lit(5))).cast("int"),
    }


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """n rows of REAL format payloads (PPM / WAV / y4m round-robin by id),
    deterministic in (n, seed)."""
    base = spark.range(n).select(
        F.col("id"),
        F.format_string("m_%06d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id") + seed, F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        (F.pmod(F.col("id"), F.lit(5)) + 4).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(3)) + 4).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.col("id"), F.lit(5)) + 2).cast("int").alias("n_frames"),
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for i, kind, w, h, nf in zip(
                pdf["id"].to_numpy(), pdf["kind"].to_numpy(),
                pdf["width"].to_numpy(), pdf["height"].to_numpy(),
                pdf["n_frames"].to_numpy(),
            ):
                i = int(i) + seed
                if kind == "image":
                    payloads.append(encode_ppm(_pixels(i, int(w), int(h))))
                    mimes.append("image/x-portable-pixmap")
                elif kind == "audio":
                    payloads.append(encode_wav(_samples(i, 64 + i % 64)))
                    mimes.append("audio/wav")
                else:
                    payloads.append(encode_y4m(_frames(i, int(nf), int(w), int(h))))
                    mimes.append("video/x-yuv4mpeg")
            out = pdf[[
                "media_id", "kind", "width", "height", "sample_rate", "n_frames"
            ]].copy()
            out["payload"] = payloads
            out["mime"] = mimes
            yield out[[
                "media_id", "kind", "payload", "width", "height",
                "sample_rate", "n_frames", "mime",
            ]]

    return base.mapInPandas(enc, MEDIA_SCHEMA)


def _docs_as_media(docs: DataFrame, kind: str) -> DataFrame:
    """Turn a (doc_id) frame into real-format media rows, seed = doc_id.
    The generative rules live in _pixels/_samples/_frames + media_params,
    so a SQL oracle can predict every decoded feature while the Spark path
    round-trips genuine format bytes."""
    p = media_params(F.col("doc_id"))
    base = docs.select(
        F.col("doc_id"),
        p["width"].alias("width"),
        p["height"].alias("height"),
        p["n_samples"].alias("n_samples"),
        p["n_frames"].alias("n_frames"),
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d, w, h, ns, nf in zip(
                pdf["doc_id"].to_numpy(), pdf["width"].to_numpy(),
                pdf["height"].to_numpy(), pdf["n_samples"].to_numpy(),
                pdf["n_frames"].to_numpy(),
            ):
                d = int(d)
                if kind == "image":
                    payloads.append(encode_ppm(_pixels(d, int(w), int(h))))
                elif kind == "audio":
                    payloads.append(encode_wav(_samples(d, int(ns))))
                else:
                    payloads.append(encode_y4m(_frames(d, int(nf), int(w), int(h))))
            out = pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype(str),
                    "kind": kind,
                    "payload": payloads,
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "sample_rate": 16000,
                    "n_frames": pdf["n_frames"],
                    "mime": "application/octet-stream",
                }
            )
            yield out

    return base.mapInPandas(enc, MEDIA_SCHEMA)


def docs_as_images(docs: DataFrame) -> DataFrame:
    return _docs_as_media(docs, "image")


def docs_as_audio(docs: DataFrame) -> DataFrame:
    return _docs_as_media(docs, "audio")


def docs_as_videos(docs: DataFrame) -> DataFrame:
    return _docs_as_media(docs, "video")


# ---------------------------------------------------------------------------
# Feature extraction (real decode, narrow plans)
# ---------------------------------------------------------------------------


def image_features(df: DataFrame) -> DataFrame:
    """mapInPandas: P6 decode -> per-channel int sums + means + dims. The
    width/height come from the PARSED HEADER, not the metadata columns, so
    a header-parse bug can't hide."""
    out_schema = (
        "media_id string, width int, height int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, "
        "mean_r double, mean_g double, mean_b double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = w * h
                recs.append(
                    (mid, w, h, int(s[0]), int(s[1]), int(s[2]),
                     s[0] / n, s[1] / n, s[2] / n)
                )
            yield pd.DataFrame(
                recs,
                columns=["media_id", "width", "height",
                         "sum_r", "sum_g", "sum_b",
                         "mean_r", "mean_g", "mean_b"],
            )

    return df.filter(F.col("kind") == "image").mapInPandas(extract, out_schema)


def audio_stats(df: DataFrame) -> DataFrame:
    """mapInPandas: RIFF/PCM decode -> sample count (from the data chunk),
    int64 sum, peak |amplitude|, parsed sample rate."""
    out_schema = (
        "media_id string, sample_rate int, n_samples int, "
        "sum_amp bigint, peak int"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                recs.append(
                    (mid, rate, len(samples),
                     int(samples.sum(dtype=np.int64)),
                     int(np.abs(samples.astype(np.int32)).max(initial=0)))
                )
            yield pd.DataFrame(
                recs,
                columns=["media_id", "sample_rate", "n_samples", "sum_amp", "peak"],
            )

    return df.filter(F.col("kind") == "audio").mapInPandas(extract, out_schema)


def resize_images(df: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """mapInPandas nearest-neighbor resize over REAL decoded pixels,
    re-encoded as a valid P6 payload."""
    out_schema = "media_id string, width int, height int, payload binary"

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                yi = np.arange(out_h) * h // out_h
                xi = np.arange(out_w) * w // out_w
                recs.append((mid, out_w, out_h, encode_ppm(px[yi][:, xi])))
            yield pd.DataFrame(
                recs, columns=["media_id", "width", "height", "payload"]
            )

    return df.filter(F.col("kind") == "image").mapInPandas(do, out_schema)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling over REAL y4m decode: one row per kept frame,
    checksum = int64 sum of the frame's bytes."""
    out_schema = "media_id string, frame_idx int, frame_checksum bigint"

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chks = [], [], []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                _, _, frames = decode_y4m(bytes(payload))
                for i in range(0, len(frames), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    chks.append(int(frames[i].sum(dtype=np.int64)))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_checksum": chks}
            )

    return df.filter(F.col("kind") == "video").mapInPandas(do, out_schema)
