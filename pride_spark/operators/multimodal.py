"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension (no reference counterpart): a 100 TB training-data
pipeline carries media as ``binary`` columns with struct metadata, and the
decode / feature-extract / resize / frame-sample steps run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by row.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are deterministic fakes behind ``_decode_*`` seams, clearly
marked — the Spark-side plumbing (schemas, batch iteration, partitioning,
output contracts) is real and tested.  Swap the kernel, keep the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media row: id + opaque payload + typed metadata (SURVEY north-star spec).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", IntegerType()),
        StructField("byte_mean", IntegerType()),
        StructField("phash", LongType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType()),
    ]
)


def _decode_image(payload: bytes) -> bytes:
    """STUB decode seam — replace with PIL in a full container.

    Deterministic fake: the 'decoded pixels' are the payload itself.
    """
    if payload is None:
        raise NotImplementedError("real image decode requires PIL; payload was None")
    return payload


def image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over image payloads.

    Real plumbing: ``mapInPandas`` receives pandas batches (zero-copy via
    Arrow for binary), emits a narrow feature table.  The per-byte stats
    and the 64-bit fake perceptual hash are deterministic stand-ins for a
    CNN/pHash kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [len(p) for p in payloads],
                    "byte_mean": [int(sum(p) / len(p)) if len(p) else 0 for p in payloads],
                    "phash": [
                        int.from_bytes(p[:8].ljust(8, b"\0"), "big", signed=True)
                        for p in payloads
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", IntegerType()),
        StructField("rms", IntegerType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


def _decode_audio(payload: bytes) -> list[int]:
    """STUB decode seam — replace with soundfile/torchaudio in a full
    container.  Deterministic fake: payload bytes as signed 8-bit PCM."""
    if payload is None:
        raise NotImplementedError("real audio decode requires a codec; payload was None")
    return [b - 256 if b > 127 else b for b in payload]


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched waveform features over audio payloads.

    Same plumbing contract as :func:`image_features`: ``mapInPandas``
    batches in, a narrow feature table out.  Sample count, integer RMS
    and zero-crossing count are deterministic stand-ins for a real
    spectral kernel (MFCC/chroma), computable on the fake PCM decode.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            waves = [_decode_audio(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_samples": [len(w) for w in waves],
                    "rms": [
                        int((sum(s * s for s in w) / len(w)) ** 0.5) if w else 0
                        for w in waves
                    ],
                    "zero_crossings": [
                        sum(
                            1
                            for a, b in zip(w, w[1:])
                            if (a < 0) != (b < 0)
                        )
                        for w in waves
                    ],
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payload through, rewrites metadata; the batch
    shape / schema contract is what a real PIL kernel would use."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(kernel, media.schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → one row per sampled frame (explode in Python batch space).

    STUB frame extraction (slices of the payload); real plumbing: a
    1→N ``mapInPandas`` producing a tall frame table partitioned by
    ``media_id`` for downstream per-frame featurization.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                n = max(int((row["duration_ms"] or 0) // every_ms), 1)
                payload = row["payload"] or b""
                for i in range(n):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    frames.append(bytes(payload[i : i + 16]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture (test substrate):
    text bytes stand in for payloads; kind round-robins by doc_id."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("n_chars").cast("int") * 10).alias("duration_ms"),
    )
