"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads + typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The decode step is STUBBED (this container has no image/audio libs): when
Pillow/soundfile are importable the real decoder slots into ``_decode_rgb``
/ ``_decode_pcm``; otherwise a clearly-marked deterministic fake derived
from the payload bytes keeps the Spark-side contract — schema, partition
flow, UDF signature, Arrow batch shape — fully real and testable.

Scale notes: payloads never pass through a shuffle — every transform here
is a narrow mapInPandas; only the (small) extracted features get grouped
or joined downstream. At 100 TB keep payloads in their own column family
(parquet column chunk) so feature queries prune them at the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

try:  # real decoder, if ever available
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int, mime string"
)


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque payloads (hash-derived bytes) + metadata."""
    df = spark.range(n).select(
        F.format_string("m_%06d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(seed), F.col("id")), 256).cast("binary").alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(512)) + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(300)) + 1).cast("int").alias("n_frames"),
        F.lit("application/octet-stream").alias("mime"),
    )
    return df


def _decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: deterministic fake pixels from the payload bytes. Real path
    (PIL) raises until the dependency exists so nobody trusts fake pixels
    in production."""
    if _HAS_PIL:
        raise NotImplementedError(
            "real image decode not wired yet; see multimodal.py STUB note"
        )
    b = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height * 3 / len(b)))
    return np.tile(b, reps)[: width * height * 3].reshape(height, width, 3)


def image_features(df: DataFrame) -> DataFrame:
    """mapInPandas: payload -> (mean/std per RGB channel + dims). Narrow."""
    out_schema = (
        "media_id string, width int, height int, "
        "mean_r double, mean_g double, mean_b double, std_all double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, r in pdf.iterrows():
                px = _decode_rgb(bytes(r["payload"]), int(r["width"]), int(r["height"]))
                recs.append(
                    (
                        r["media_id"],
                        int(r["width"]),
                        int(r["height"]),
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        float(px.std()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "width", "height",
                    "mean_r", "mean_g", "mean_b", "std_all",
                ],
            )

    return df.filter(F.col("kind") == "image").mapInPandas(extract, out_schema)


def resize_images(df: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """mapInPandas resize: nearest-neighbor over the (stub-)decoded pixels,
    re-encoded as raw bytes. Shape/byte-count contract is real."""
    out_schema = "media_id string, width int, height int, payload binary"

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, r in pdf.iterrows():
                px = _decode_rgb(bytes(r["payload"]), int(r["width"]), int(r["height"]))
                yi = (np.arange(out_h) * px.shape[0] // out_h)
                xi = (np.arange(out_w) * px.shape[1] // out_w)
                small = px[yi][:, xi]
                recs.append((r["media_id"], out_w, out_h, small.tobytes()))
            yield pd.DataFrame(
                recs, columns=["media_id", "width", "height", "payload"]
            )

    return df.filter(F.col("kind") == "image").mapInPandas(do, out_schema)


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling: emits one row per kept frame index (the
    decode itself is stubbed; the row-explosion plumbing is real)."""
    out_schema = "media_id string, frame_idx int, frame_checksum bigint"

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chks = [], [], []
            for _, r in pdf.iterrows():
                b = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
                for i in range(0, int(r["n_frames"]), every_n):
                    ids.append(r["media_id"])
                    idxs.append(i)
                    chks.append(int(b[(i * 7) % len(b)]) * 1000003 + i)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_checksum": chks}
            )

    return df.filter(F.col("kind") == "video").mapInPandas(do, out_schema)
