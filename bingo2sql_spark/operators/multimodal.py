"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque `binary` columns + typed metadata structs. The actual
codec work (decode, resize, frame-sample, spectrogram) runs in Arrow-
batched `mapInPandas` — the Spark-side contract (schema, partitioning,
batch shape) is real and tested; the codec itself is STUBBED in this
container (no image/audio libs): `feature_stub` computes deterministic
fake features, and `decode_image`/`decode_audio` raise
NotImplementedError with the exact integration point documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
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

FEATURE_DIM = 8


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents fixture: text
    bytes stand in for encoded media payloads."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, mime: str) -> object:
    """REAL integration point: PIL.Image.open(io.BytesIO(payload)).
    Not available in this container."""
    raise NotImplementedError(
        "image codec not available in this environment; plug PIL/cv2 here"
    )


def decode_audio(payload: bytes, mime: str) -> object:
    """REAL integration point: soundfile/librosa decode."""
    raise NotImplementedError(
        "audio codec not available in this environment; plug soundfile here"
    )


def extract_features(media: DataFrame, batch_limit: int = 10_000) -> DataFrame:
    """mapInPandas feature extraction: the production shape (Arrow
    batches in, fixed-dim float vectors out, media never leaves the
    executor). The codec call is stubbed with a deterministic byte-
    statistics feature so plumbing is testable end-to-end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue

            def feat(payload) -> list[float]:
                if payload is None or len(payload) == 0:
                    return [0.0] * FEATURE_DIM
                b = bytes(payload)
                n = len(b)
                # deterministic stand-in for codec features
                return [
                    float(len(b)),
                    float(b[0]) if b else 0.0,
                    float(b[-1]) if b else 0.0,
                    float(sum(b[:64]) % 997),
                    float(n % 251),
                    float(b[n // 2]),
                    float(min(b)),
                    float(max(b)),
                ]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(feat),
                }
            )

    return media.mapInPandas(
        gen, schema="media_id long, kind string, features array<double>"
    )
