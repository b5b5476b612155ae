"""Multimodal column plumbing: schemas, mapInPandas batch contracts."""

from __future__ import annotations

from pride_spark.operators import multimodal as mm


def _media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    return mm.synthesize_media_from_documents(docs)


def test_media_schema(spark):
    media = _media(spark)
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_deterministic(spark):
    media = _media(spark)
    feats = mm.image_features(media)
    assert feats.schema.simpleString() == mm.IMAGE_FEATURES_SCHEMA.simpleString()
    rows = {r["media_id"]: r for r in feats.collect()}
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images > 0
    # deterministic: same input → same features
    again = {r["media_id"]: r for r in mm.image_features(media).collect()}
    assert all(rows[k] == again[k] for k in rows)
    assert all(r["n_bytes"] > 0 for r in rows.values())


def test_audio_features_match_reference_arithmetic(spark):
    media = _media(spark)
    feats = mm.audio_features(media)
    assert feats.schema.simpleString() == mm.AUDIO_FEATURES_SCHEMA.simpleString()
    rows = {r["media_id"]: r for r in feats.collect()}
    audio = {r["media_id"]: bytes(r["payload"]) for r in media.filter("kind='audio'").collect()}
    assert set(rows) == set(audio) and rows
    # features must equal the plain-Python computation on the raw bytes
    for mid, payload in audio.items():
        w = [b - 256 if b > 127 else b for b in payload]
        assert rows[mid]["n_samples"] == len(w)
        assert rows[mid]["rms"] == int((sum(s * s for s in w) / len(w)) ** 0.5)
        assert rows[mid]["zero_crossings"] == sum(
            1 for a, b in zip(w, w[1:]) if (a < 0) != (b < 0)
        )


def test_resize_rewrites_metadata_only(spark):
    media = _media(spark)
    out = mm.resize_images(media, 32, 48).collect()
    assert all(r["width"] == 32 and r["height"] == 48 for r in out)


def test_frame_sampling_explodes(spark):
    media = _media(spark)
    frames = mm.sample_frames(media, every_ms=5000)
    per = frames.groupBy("media_id").count().collect()
    vids = {r["media_id"]: r["duration_ms"] for r in media.filter("kind='video'").collect()}
    assert {r["media_id"] for r in per} == set(vids)
    for r in per:
        assert r["count"] == max(vids[r["media_id"]] // 5000, 1)
