"""Multimodal plumbing: schema, Arrow batch shape, determinism of the
stubbed decode, and JVM-side frame sampling."""

from beetle_search_engine_spark.operators.multimodal import (
    extract_features,
    generate_media,
    sample_frames,
)


def test_feature_extraction_deterministic(spark):
    media = generate_media(spark, 50, seed=5)
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    f2 = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    assert f1 == f2
    assert len(f1) == 50
    assert all(len(v) == 8 for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)


def test_frame_sampling(spark):
    media = generate_media(spark, 100, seed=5)
    frames = sample_frames(media, every_ms=5000)
    rows = frames.collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 5000 for r in rows)
    vids = media.filter("kind = 'video'").count()
    assert frames.select("media_id").distinct().count() == vids
