"""Media-extraction throughput stress: mapInPandas decode kernels at
factor-10 row counts, with a REAL injected third-party codec.

Round-9 verdict task 3's stress half: the decoder-injection contract
(tests/test_multimodal.py::test_injected_*) proves correctness; this
harness proves THROUGHPUT — Arrow-batched ``image_features`` /
``audio_features`` over hundreds of thousands of binary payloads, in
three kernels:

- ``image_stub``    — plumbing-only baseline (payload == pixels): what
  the Arrow batch transfer + pandas kernel costs with a free decode.
- ``image_jpeg``    — the injected pure-python baseline JPEG decoder
  (tests/codec_jpeg.py, shipped to executors via ``addPyFile`` exactly
  like a production codec wrapper): every payload is a genuine JFIF
  file, huffman-decoded + IDCT'd per row.
- ``audio_wav``     — the builtin real WAV path (stdlib ``wave``) over
  RIFF payloads.

Payloads are synthesized driver-side from a small template pool (64
distinct JPEGs / WAVs) and fanned out Spark-side with a broadcast join —
the decode work per row is identical to distinct payloads (decoders see
bytes, not identities) while the build stays O(templates).

Usage:
    python tools/stress_media.py [--rows 200000] [--runs 2]

Prints one JSON object with per-kernel wall seconds and rows/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_media(spark, rows: int):
    """(images_df, audio_df) with `rows` rows each from 64 templates."""
    import io
    import wave

    from pyspark.sql import functions as F

    from codec_jpeg import encode_gray
    from pride_spark.operators.multimodal import MEDIA_SCHEMA

    jpeg_tpl, wav_tpl = [], []
    for t in range(64):
        v1, v2 = (t * 37) % 256, (t * 11 + 91) % 256
        px = [[v1] * 8 + [v2] * 8 for _ in range(16)]
        jpeg_tpl.append((t, bytearray(encode_gray(px))))
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            samples = [(t * 257 + i * 131) % 4096 - 2048 for i in range(256)]
            w.writeframes(
                b"".join(s.to_bytes(2, "little", signed=True) for s in samples)
            )
        wav_tpl.append((t, bytearray(buf.getvalue())))

    base = spark.range(rows).select(
        F.col("id").alias("media_id"), (F.col("id") % 64).alias("t")
    )

    def fan(templates, kind, mime):
        tpl = spark.createDataFrame(templates, "t long, payload binary")
        return (
            base.join(F.broadcast(tpl), "t")
            .select(
                "media_id",
                F.lit(kind).alias("kind"),
                "payload",
                F.lit(mime).alias("mime"),
                F.lit(16).alias("width"),
                F.lit(16).alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
            )
            .select(*[f.name for f in MEDIA_SCHEMA.fields])
        )

    return fan(jpeg_tpl, "image", "image/jpeg"), fan(wav_tpl, "audio", "audio/wav")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pride_spark.operators import multimodal as mm
    from pride_spark.session import get_spark

    import codec_jpeg

    spark = get_spark("stress-media")
    spark.sparkContext.setLogLevel("ERROR")
    # production codec-deployment route: ship the module to executors
    spark.sparkContext.addPyFile(os.path.join(REPO, "tests", "codec_jpeg.py"))

    images, audio = build_media(spark, args.rows)
    images = images.persist()
    audio = audio.persist()
    images.count(), audio.count()  # materialize inputs outside the timers

    kernels = {
        "image_stub": lambda: mm.image_features(images),
        "image_jpeg": lambda: mm.image_features(images, decoder=codec_jpeg.decode_rgb),
        "audio_wav": lambda: mm.audio_features(audio, decoder="real"),
    }
    out = {"rows": args.rows, "runs": args.runs, "kernels": {}}
    # r11: optional Pillow fast path through the same seam — measured
    # against the pure-python JPEG baseline when the library is present,
    # recorded as unavailable (not silently omitted) when it isn't
    try:
        pillow = mm.pillow_image_decoder()
        kernels["image_jpeg_pillow"] = lambda: mm.image_features(images, decoder=pillow)
    except ImportError:
        out["image_jpeg_pillow"] = "unavailable: Pillow not installed"
    for name, mk in kernels.items():
        best = None
        for _ in range(args.runs):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out["kernels"][name] = {
            "sec": round(best, 2),
            "rows_per_sec": int(args.rows / best),
        }
    stub = out["kernels"]["image_stub"]["sec"]
    jpeg = out["kernels"]["image_jpeg"]["sec"]
    out["jpeg_decode_overhead_x"] = round(jpeg / stub, 2) if stub else None
    if "image_jpeg_pillow" in out["kernels"]:
        out["pillow_speedup_x"] = round(
            jpeg / out["kernels"]["image_jpeg_pillow"]["sec"], 2
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
