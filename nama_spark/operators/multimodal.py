"""Multimodal columns — image/audio/video as opaque binary with typed
metadata.

The Spark-side plumbing (schemas, partition-preserving mapInPandas, Arrow
batch shapes, UDF signatures) is real and tested; the codec step is STUBBED —
this container has no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded from the bytes) produces stable feature rows. Swapping
the stub for Pillow/torchaudio later changes one function, not the plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), True),       # opaque payload
        T.StructField("meta", T.StringType(), True),       # JSON sidecar
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.FloatType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_real(data: bytes):
    raise NotImplementedError(
        "image codecs are not available in this container; pass fake=True "
        "or plug a Pillow-based decoder here"
    )


def _decode_image_fake(data: bytes, dim: int = 8):
    """Deterministic fake decode: stable pseudo-dimensions + a seeded feature
    vector derived from the payload hash. Keeps tests meaningful (same bytes →
    same features) while exercising the full Arrow path."""
    h = hashlib.sha256(data or b"").digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    w = 16 + h[4] % 240
    ht = 16 + h[5] % 240
    luma = float(h[6]) / 255.0
    feat = rng.normal(0, 1, dim).astype(np.float32)
    feat /= max(float(np.linalg.norm(feat)), 1e-9)
    return w, ht, luma, feat


def extract_image_features(
    media: DataFrame, fake: bool = False, dim: int = 8, batch_partitions: int | None = None
) -> DataFrame:
    """Decode + featurize image rows via mapInPandas (Arrow batches of binary
    payloads). Non-image rows are filtered before the Python boundary so the
    UDF only ever sees its modality."""

    imgs = media.where(F.col("kind") == "image").select("media_id", "data")
    if batch_partitions:
        imgs = imgs.repartition(batch_partitions, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                payload = bytes(data) if data is not None else b""
                if fake:
                    w, h, luma, feat = _decode_image_fake(payload, dim)
                else:
                    w, h, luma, feat = _decode_image_real(payload)
                rows.append((int(mid), int(w), int(h), float(luma), feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_luma", "feature"]
            )

    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def _decode_audio_real(data: bytes):
    raise NotImplementedError(
        "audio codecs are not available in this container; pass fake=True "
        "or plug a soundfile/torchaudio-based decoder here"
    )


def _decode_audio_fake(data: bytes, dim: int = 8):
    """Deterministic fake audio decode, same pattern as _decode_image_fake:
    scalar 'decode' fields are pure sha256 byte math (so an external SQL
    engine can recompute them — the driver oracle does), the feature vector
    is a seeded RNG draw (pinned by pytest)."""
    h = hashlib.sha256(data or b"").digest()
    sample_rate = (8000, 16000, 22050, 44100)[h[7] % 4]
    n_samples = 1000 + int.from_bytes(h[8:10], "big") % 100000
    duration = n_samples / sample_rate
    rms = float(h[10]) / 255.0
    rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
    feat = rng.normal(0, 1, dim).astype(np.float32)
    feat /= max(float(np.linalg.norm(feat)), 1e-9)
    return sample_rate, n_samples, duration, rms, feat


def extract_audio_features(
    media: DataFrame, fake: bool = False, dim: int = 8,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode + featurize audio rows via mapInPandas — the audio counterpart
    of extract_image_features, so all three modalities share one plumbing
    pattern (modality filtered before the Python boundary, Arrow batches of
    binary payloads, typed feature schema)."""

    auds = media.where(F.col("kind") == "audio").select("media_id", "data")
    if batch_partitions:
        auds = auds.repartition(batch_partitions, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                payload = bytes(data) if data is not None else b""
                if fake:
                    sr, ns, dur, rms, feat = _decode_audio_fake(payload, dim)
                else:
                    sr, ns, dur, rms, feat = _decode_audio_real(payload)
                rows.append(
                    (int(mid), int(sr), int(ns), float(dur), float(rms),
                     feat.tolist())
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples",
                         "duration_sec", "rms", "feature"],
            )

    return auds.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index. The
    frame decode itself is the stubbed step; frame *indexing* is derived from
    the (fake) metadata so the explode shape is real."""
    vids = media.where(F.col("kind") == "video").select("media_id", "data", "meta")
    n_frames = F.coalesce(
        F.get_json_object(F.col("meta"), "$.n_frames").cast("int"), F.lit(30)
    )
    # n_frames <= 0 would run F.sequence backwards against a positive step
    # (runtime error) — such rows yield zero frames instead
    frames = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<int>"))
    out = vids.select("media_id", F.explode(frames).alias("frame_idx"))
    if not fake:
        # real decode would happen in a mapInPandas over (media_id, frame_idx)
        return out.withColumn("decoded", F.lit(False))
    return out.withColumn("decoded", F.lit(True))


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter for tests/benchmarks: wrap document text bytes as opaque media
    payloads with the MEDIA_SCHEMA (no external data needed)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        F.to_json(F.struct(F.col("n_chars").alias("n_frames"))).alias("meta"),
    )
