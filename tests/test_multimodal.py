"""Multimodal column plumbing: schemas, mapInPandas batch contracts."""

from __future__ import annotations

import io
import wave

import pytest
from pyspark.sql import functions as F

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


# --- real-decoder paths (feature-probed; stub stays the hermetic default) ---


def _wav_bytes(samples: list[int]) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(s.to_bytes(2, "little", signed=True) for s in samples))
    return buf.getvalue()


def test_audio_features_real_wav_decode(spark):
    # stdlib wave is always present: the real path runs hermetically in CI
    samples = [0, 1000, -1000, 500, -500, 0, 2000, -2000]
    rows = [(1, "audio", _wav_bytes(samples), "audio/wav", None, None, None)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.audio_features(media, decoder="real").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == len(samples)
    assert r["rms"] == int((sum(s * s for s in samples) / len(samples)) ** 0.5)
    assert r["zero_crossings"] == sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
    )


def test_decoder_auto_matches_probe(spark):
    # auto is per-payload best-effort for audio (non-WAV payloads without
    # soundfile fall back to the stub); for image/video it must fall back
    # to the stub when PIL/ffmpeg are absent
    sup = mm.codec_support()
    assert sup["audio"] is True
    media = _media(spark)
    if not sup["audio_soundfile"]:
        # synthesized payloads are text bytes (not RIFF): auto must equal
        # the stub on every row instead of crashing on soundfile import
        stub_a = {r["media_id"]: r for r in mm.audio_features(media).collect()}
        auto_a = {
            r["media_id"]: r
            for r in mm.audio_features(media, decoder="auto").collect()
        }
        assert stub_a == auto_a
    if not sup["image"]:
        stub = {r["media_id"]: r for r in mm.image_features(media).collect()}
        auto = {r["media_id"]: r for r in mm.image_features(media, decoder="auto").collect()}
        assert stub == auto
    if not sup["video"]:
        stub = mm.sample_frames(media, every_ms=5000).count()
        auto = mm.sample_frames(media, every_ms=5000, decoder="auto").count()
        assert stub == auto


def test_decoder_auto_flags_fallback_rows(spark):
    # a valid WAV decodes real (flag True); a corrupt/truncated RIFF falls
    # back to the stub and MUST be flagged decoded_real=False so mixed
    # best-effort output is distinguishable downstream
    good = _wav_bytes([0, 1000, -1000, 500])
    corrupt = b"RIFF" + b"\x00" * 8  # RIFF magic, unparseable body
    rows = [
        (1, "audio", good, "audio/wav", None, None, None),
        (2, "audio", corrupt, "audio/wav", None, None, None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.audio_features(media, decoder="auto").collect()}
    assert out[1]["decoded_real"] is True
    assert out[2]["decoded_real"] is False
    # the fallback row's features are the stub arithmetic over raw bytes
    w = [b - 256 if b > 127 else b for b in corrupt]
    assert out[2]["n_samples"] == len(w)
    # strict modes are uniform: real is all-True, stub all-False
    assert all(
        r["decoded_real"] for r in mm.audio_features(
            spark.createDataFrame(rows[:1], mm.MEDIA_SCHEMA), decoder="real"
        ).collect()
    )
    assert not any(
        r["decoded_real"] for r in mm.audio_features(media).collect()
    )


@pytest.mark.skipif(not mm.codec_support()["image"], reason="PIL not installed")
def test_image_features_real_pil_decode(spark):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 2), (10, 20, 30)).save(buf, format="PNG")
    rows = [(1, "image", buf.getvalue(), "image/png", 4, 2, None)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.image_features(media, decoder="real").collect()
    assert out[0]["n_bytes"] == 4 * 2 * 3
    assert out[0]["byte_mean"] == 20


@pytest.mark.skipif(not mm.codec_support()["video"], reason="ffmpeg not installed")
def test_sample_frames_real_ffmpeg_decode(spark, tmp_path):
    import subprocess

    src = tmp_path / "test.mp4"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi", "-i", "testsrc=duration=2:rate=5",
         str(src)],
        check=True,
    )
    rows = [(1, "video", src.read_bytes(), "video/mp4", None, None, 2000)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.sample_frames(media, every_ms=1000, decoder="real").collect()
    assert len(out) >= 2
    assert all(bytes(r["frame"])[:2] == b"\xff\xd8" for r in out)  # JPEG SOI
