"""Multimodal: pure-numpy codecs for real public formats (PPM P6,
RIFF/WAV PCM16, YUV4MPEG2) + the narrow Spark plumbing around them."""

from __future__ import annotations

import numpy as np
import pytest

from gfs_to_prometheus_spark.operators import multimodal as mm


# ---------------------------------------------------------------------------
# Codec round trips (driver-side, no Spark)
# ---------------------------------------------------------------------------


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    w, h, got = mm.decode_ppm(mm.encode_ppm(px))
    assert (w, h) == (9, 5)
    assert np.array_equal(got, px)


def test_ppm_comment_and_split_header():
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6\n# a comment line\n2\n# more\n2 255\n" + px.tobytes()
    w, h, got = mm.decode_ppm(raw)
    assert (w, h) == (2, 2)
    assert np.array_equal(got, px)


def test_ppm_rejects_non_p6():
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P5\n2 2\n255\n" + bytes(4))


def test_wav_roundtrip_and_chunk_walk():
    s = (np.arange(100) * 37 % 4096 - 2048).astype(np.int16)
    rate, got = mm.decode_wav(mm.encode_wav(s, 22050))
    assert rate == 22050
    assert np.array_equal(got, s)
    # an extra chunk between fmt and data must be skipped (odd size padded)
    import struct

    raw = mm.encode_wav(s, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"abcde\x00"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate2, got2 = mm.decode_wav(patched)
    assert rate2 == 8000 and np.array_equal(got2, s)


def test_y4m_roundtrip():
    rng = np.random.default_rng(3)
    fr = rng.integers(0, 256, (4, 3, 5, 3), dtype=np.uint8)
    w, h, got = mm.decode_y4m(mm.encode_y4m(fr))
    assert (w, h) == (5, 3)
    assert np.array_equal(got, fr)


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def test_synth_media_deterministic_real_formats(spark):
    a = mm.synth_media(spark, 30).orderBy("media_id").collect()
    b = mm.synth_media(spark, 30).orderBy("media_id").collect()
    assert a == b
    for r in a:
        if r["kind"] == "image":
            assert bytes(r["payload"])[:2] == b"P6"
        elif r["kind"] == "audio":
            assert bytes(r["payload"])[:4] == b"RIFF"
        else:
            assert bytes(r["payload"])[:9] == b"YUV4MPEG2"


def test_image_features_match_encoded_pixels(spark):
    media = mm.synth_media(spark, 30, seed=5)
    feats = {r["media_id"]: r for r in mm.image_features(media).collect()}
    src = media.filter("kind = 'image'").collect()
    assert len(feats) == len(src) > 0
    for r in src:
        w, h, px = mm.decode_ppm(bytes(r["payload"]))
        f = feats[r["media_id"]]
        assert (f["width"], f["height"]) == (w, h) == (r["width"], r["height"])
        assert f["sum_r"] == int(px[:, :, 0].sum())
        assert f["mean_b"] == px[:, :, 2].sum() / (w * h)


def test_audio_stats_match_encoded_samples(spark):
    media = mm.synth_media(spark, 30, seed=5)
    stats = {r["media_id"]: r for r in mm.audio_stats(media).collect()}
    src = media.filter("kind = 'audio'").collect()
    assert len(stats) == len(src) > 0
    for r in src:
        rate, s = mm.decode_wav(bytes(r["payload"]))
        g = stats[r["media_id"]]
        assert g["sample_rate"] == rate == 16000
        assert g["n_samples"] == len(s)
        assert g["sum_amp"] == int(s.sum(dtype=np.int64))
        assert g["peak"] == int(np.abs(s.astype(np.int32)).max())


def test_resize_emits_valid_ppm(spark):
    media = mm.synth_media(spark, 30)
    out = mm.resize_images(media, out_w=8, out_h=8).collect()
    assert len(out) > 0
    for r in out:
        w, h, px = mm.decode_ppm(bytes(r["payload"]))
        assert (w, h) == (8, 8)
        assert px.shape == (8, 8, 3)


def test_frame_sampling_counts_and_checksums(spark):
    media = mm.synth_media(spark, 40)
    vids = {r["media_id"]: r for r in media.filter("kind='video'").collect()}
    out = mm.sample_frames(media, every_n=2).collect()
    per: dict[str, int] = {}
    for r in out:
        per[r["media_id"]] = per.get(r["media_id"], 0) + 1
        _, _, frames = mm.decode_y4m(bytes(vids[r["media_id"]]["payload"]))
        assert r["frame_checksum"] == int(frames[r["frame_idx"]].sum(dtype=np.int64))
    assert per == {k: (r["n_frames"] + 1) // 2 for k, r in vids.items()}


def test_plan_is_narrow(spark):
    """Payloads must not shuffle: the physical plan for feature extraction
    contains no Exchange."""
    media = mm.synth_media(spark, 10)
    plan = mm.image_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Property tests (random shapes/content)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40), h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_roundtrip_property(w, h, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    gw, gh, got = mm.decode_ppm(mm.encode_ppm(px))
    assert (gw, gh) == (w, h) and np.array_equal(got, px)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 500),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    s = np.random.default_rng(seed).integers(-32768, 32768, n).astype(np.int16)
    grate, got = mm.decode_wav(mm.encode_wav(s, rate))
    assert grate == rate and np.array_equal(got, s)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 6), w=st.integers(1, 16), h=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_property(n, w, h, seed):
    fr = np.random.default_rng(seed).integers(
        0, 256, (n, h, w, 3), dtype=np.uint8
    )
    gw, gh, got = mm.decode_y4m(mm.encode_y4m(fr))
    assert (gw, gh) == (w, h)
    assert got.shape == (n, h, w, 3) and np.array_equal(got, fr)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_decoders_reject_or_parse_garbage(data):
    """Decoders must raise ValueError on garbage, never crash or loop."""
    for dec in (mm.decode_ppm, mm.decode_wav, mm.decode_y4m):
        try:
            dec(data)
        except (ValueError, IndexError):
            pass


def test_decode_wav_truncated_fmt_chunk_raises_valueerror():
    """A fmt chunk whose declared size runs past the payload must hit the
    documented ValueError contract, not struct.error (ADVICE r3)."""
    import pytest as _pytest

    from gfs_to_prometheus_spark.operators import multimodal as mm

    import struct as _struct

    # valid RIFF/WAVE prefix, fmt header declaring 16 bytes, only 4 present
    payload = (
        b"RIFF" + _struct.pack("<I", 24) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 16) + b"\x01\x00\x01\x00"
    )
    with _pytest.raises(ValueError, match="truncated fmt"):
        mm.decode_wav(payload)
