"""Multimodal column plumbing: opaque binary media + typed metadata.

Extensions beyond the reference (per the build brief). Image/audio/video
payloads are opaque `binary` columns with a typed metadata struct; the
Spark-side machinery — schema, partition sizing, mapInPandas batch shape,
UDF signatures — is real and tested. The actual codec kernels are STUBBED
(this container ships no image/audio libraries): decode attempts raise
NotImplementedError unless `deterministic_fake=True`, which produces a
seed-stable fake feature vector so pipelines exercise end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: features derive
    solely from the payload hash, so tests are stable across runs."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 8) // len(digest) + 1))[: dim * 8], dtype=np.uint64)
    return (raw.astype(np.float64) / np.float64(2**64)).tolist()


def _try_real_decode(payload: bytes, kind: str):
    try:  # pragma: no cover - decode libs absent in this container
        if kind == "image":
            import PIL.Image  # noqa: F401
        elif kind == "audio":
            import soundfile  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"no {kind} codec available in this environment; "
            "use deterministic_fake=True for pipeline testing"
        )
    raise NotImplementedError("real decode path not implemented in sandbox")


def extract_features(
    media: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """(media_id, kind, features array<double>) via Arrow-batched
    mapInPandas; partitions stream batches, payloads never collect."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if deterministic_fake:
                    feats.append(_fake_features(bytes(payload)))
                else:
                    _try_real_decode(bytes(payload), kind)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, "media_id string, kind string, features array<double>"
    )


def frame_sample(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """Deterministic byte-range 'frame' sampling: n equal-spaced 64-byte
    slices of the payload (the video analog of exact.py's 3-point sample)
    — pure builtin binary slicing, no UDF."""
    length = F.octet_length("payload")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.col("payload").substr(
            (i * F.greatest(length - 64, F.lit(0)) / F.lit(max(n_frames - 1, 1))).cast("long") + 1,
            F.lit(64),
        ),
    )
    return media.withColumn("frames", frames).withColumn(
        "frame_hashes", F.transform("frames", lambda fr: F.sha2(fr, 256))
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: updates meta dims; payload transform stubbed to the
    identity (real kernel needs a codec)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )
