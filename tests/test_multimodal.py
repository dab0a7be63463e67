"""Multimodal plumbing: schema, determinism, narrow-plan shape. (Decode is
stubbed per container constraints; the Spark-side contract is real.)"""

from __future__ import annotations

from gfs_to_prometheus_spark.operators import multimodal as mm


def test_synth_media_deterministic(spark):
    a = mm.synth_media(spark, 50).orderBy("media_id").collect()
    b = mm.synth_media(spark, 50).orderBy("media_id").collect()
    assert a == b
    kinds = {r["kind"] for r in a}
    assert kinds <= {"image", "audio", "video"}
    assert all(len(r["payload"]) > 0 for r in a)


def test_image_features_schema_and_determinism(spark):
    media = mm.synth_media(spark, 60)
    f1 = mm.image_features(media).orderBy("media_id").collect()
    f2 = mm.image_features(media).orderBy("media_id").collect()
    assert f1 == f2
    assert len(f1) == media.filter("kind = 'image'").count()
    assert all(0 <= r["mean_r"] <= 255 for r in f1)


def test_resize_byte_contract(spark):
    media = mm.synth_media(spark, 30)
    out = mm.resize_images(media, out_w=8, out_h=8).collect()
    assert all(len(r["payload"]) == 8 * 8 * 3 for r in out)
    assert all(r["width"] == 8 and r["height"] == 8 for r in out)


def test_frame_sampling_counts(spark):
    media = mm.synth_media(spark, 40)
    vids = {r["media_id"]: r["n_frames"] for r in media.filter("kind='video'").collect()}
    out = mm.sample_frames(media, every_n=30).collect()
    per = {}
    for r in out:
        per[r["media_id"]] = per.get(r["media_id"], 0) + 1
    expect = {k: (n + 29) // 30 for k, n in vids.items()}
    assert per == expect


def test_plan_is_narrow(spark):
    """Payloads must not shuffle: the physical plan for feature extraction
    contains no Exchange."""
    media = mm.synth_media(spark, 10)
    plan = mm.image_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
