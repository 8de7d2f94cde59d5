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
    """Decode an image payload with PIL when the library is present
    (import-gated: this container ships no image libs, so the call
    raises NotImplementedError here — the code path itself is the real
    integration, not a placeholder)."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "image codec not available in this environment (PIL missing); "
            "the decode path is import-gated — install pillow to activate"
        ) from e
    import io

    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes, mime: str) -> object:
    """Decode an audio payload with soundfile when present (import-gated
    like decode_image)."""
    try:
        import soundfile  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "audio codec not available in this environment (soundfile "
            "missing); the decode path is import-gated"
        ) from e
    import io

    return soundfile.read(io.BytesIO(payload))


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize plumbing: mapInPandas batch in, (media_id, payload,
    meta-with-new-dims) out. The pixel work is STUBBED (no PIL/cv2 in
    this container — plug `decode_image` + `Image.resize` + re-encode at
    the marked line); everything Spark-side is the production shape:
    media bytes never leave the executor, meta is rewritten typed."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            # REAL integration point: decode_image(payload, mime) ->
            # img.resize((width, height)) -> re-encode bytes. Stub keeps
            # the payload and rewrites the declared dimensions.
            out["meta"] = [
                None if m is None else {**m, "width": width, "height": height}
                for m in out["meta"]
            ]
            yield out

    return media.mapInPandas(gen, schema=media.schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one media row fans out to
    (media_id, frame_idx, ts_ms, frame_payload) rows — the 1:N batch
    shape a real decoder produces. Frame DECODE is stubbed (deterministic
    byte slices stand in for decoded frames); the fan-out cardinality
    comes from the real metadata (duration_ms / every_ms, capped)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_payload": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                dur = (meta or {}).get("duration_ms") or 0
                n = min(max_frames, max(1, int(dur // every_ms)))
                b = bytes(payload) if payload is not None else b""
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    # REAL integration point: av/ffmpeg seek+decode at
                    # ts_ms. Stub: a deterministic slice of the payload.
                    rows["frame_payload"].append(b[i : i + 16] if b else None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        gen,
        schema="media_id long, frame_idx int, ts_ms long, frame_payload binary",
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
