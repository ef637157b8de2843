"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs
(SURVEY.md §2.11 extension; no reference analog).

The Spark-side plumbing — schema, partitioning, ``mapInPandas``
signatures, batch shapes — is real and tested. The codec layer is
STUBBED: this container ships no image/audio libraries, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
the deterministic fake codec is selected. The fake produces
reproducible per-row "pixels"/"samples" from the binary content, so
feature extraction, resizing, and frame sampling exercise the full
distributed path with verifiable outputs.

Scale notes: media rows are large (MBs) — keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small (default 10k is
far too big for 4K frames), repartition by ``media_id`` before decode so
work spreads evenly, and always project metadata-only queries off the
parquet footer (column pruning keeps the binary column unread — verify
with ``ReadSchema`` in explain)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)


# ---------------------------------------------------------------------------
# Codec layer (stubbed)
# ---------------------------------------------------------------------------

def decode_image(content: bytes, fmt: str, *, codec: str = "fake") -> np.ndarray:
    """Decode image bytes to an HxWx3 uint8 array.

    ``codec="real"`` is the integration point for PIL — used when the
    library is importable, ``NotImplementedError`` otherwise (it is not
    in this container). ``codec="fake"`` derives deterministic
    pseudo-pixels from the content hash (same bytes -> same pixels on
    every executor), which keeps the distributed pipeline testable
    end-to-end."""
    if codec == "real":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError("real image decode requires PIL (not in this environment)") from e
        import io

        arr = np.asarray(Image.open(io.BytesIO(content)).convert("RGB"), dtype=np.uint8)
        return arr
    digest = hashlib.sha256(content or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    h = 8 + digest[8] % 8
    w = 8 + digest[9] % 8
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_audio(content: bytes, fmt: str, *, codec: str = "fake") -> np.ndarray:
    """Decode audio bytes to a float32 waveform in [-1, 1]. ``codec=
    "real"`` uses soundfile when importable, raises otherwise."""
    if codec == "real":
        try:
            import soundfile as sf
        except ImportError as e:
            raise NotImplementedError("real audio decode requires soundfile (not in this environment)") from e
        import io

        data, _sr = sf.read(io.BytesIO(content), dtype="float32")
        return data if data.ndim == 1 else data.mean(axis=1)
    digest = hashlib.sha256(content or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    n = 256 + digest[10] % 256
    return (rng.random(n, dtype=np.float32) * 2.0) - 1.0


# ---------------------------------------------------------------------------
# Distributed operators (mapInPandas — Arrow batch iterators)
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_pixels long, mean_r double, mean_g double, mean_b double, brightness double"
)


def extract_image_features(df: DataFrame, *, codec: str = "fake") -> DataFrame:
    """Per-image features via one decode pass. Partition-parallel; each
    Arrow batch is decoded row-by-row inside the worker (decode cost
    dominates, so per-row loop inside the batch is fine)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                px = decode_image(row["content"], row.get("format"), codec=codec)
                means = px.reshape(-1, 3).mean(axis=0)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "n_pixels": int(px.shape[0] * px.shape[1]),
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "brightness": float(px.mean()),
                    }
                )
            yield pd.DataFrame(out)

    src = df.filter(F.col("kind") == "image").select(
        "media_id", "content", F.col("meta.format").alias("format")
    )
    return src.repartition("media_id").mapInPandas(per_batch, IMAGE_FEATURE_SCHEMA)


def resize_images(df: DataFrame, *, target_h: int, target_w: int, codec: str = "fake") -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode (fake codec
    re-encodes as raw bytes). Output keeps the media schema shape."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                px = decode_image(row["content"], row.get("format"), codec=codec)
                ys = (np.arange(target_h) * px.shape[0] // target_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(target_w) * px.shape[1] // target_w).clip(0, px.shape[1] - 1)
                resized = px[np.ix_(ys, xs)]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": target_w,
                        "height": target_h,
                        "content": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(out)

    src = df.filter(F.col("kind") == "image").select(
        "media_id", "content", F.col("meta.format").alias("format")
    )
    return src.repartition("media_id").mapInPandas(
        per_batch, "media_id long, width int, height int, content binary"
    )


def sample_video_frames(df: DataFrame, *, fps: float = 1.0, codec: str = "fake") -> DataFrame:
    """One output row per sampled frame (media_id, frame_idx, ts_ms,
    frame binary). Frame count derives from ``meta.duration_ms``; the
    fake codec synthesizes per-frame bytes deterministically."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                duration_ms = int(row["duration_ms"] or 0)
                n_frames = max(int(duration_ms / 1000.0 * fps), 1)
                for i in range(n_frames):
                    ts_ms = int(i * 1000.0 / fps)
                    seed = hashlib.sha256((row["content"] or b"") + i.to_bytes(4, "big")).digest()
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "ts_ms": ts_ms,
                            "frame": seed,  # stub: digest stands in for decoded frame bytes
                        }
                    )
            yield pd.DataFrame(out)

    src = df.filter(F.col("kind") == "video").select(
        "media_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.repartition("media_id").mapInPandas(
        per_batch, "media_id long, frame_idx int, ts_ms long, frame binary"
    )


def audio_stats(df: DataFrame, *, codec: str = "fake") -> DataFrame:
    """Waveform-level stats per audio row (rms, peak, n_samples)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                wav = decode_audio(row["content"], row.get("format"), codec=codec)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_samples": len(wav),
                        "rms": float(np.sqrt((wav**2).mean())),
                        "peak": float(np.abs(wav).max()),
                    }
                )
            yield pd.DataFrame(out)

    src = df.filter(F.col("kind") == "audio").select(
        "media_id", "content", F.col("meta.format").alias("format")
    )
    return src.repartition("media_id").mapInPandas(
        per_batch, "media_id long, n_samples long, rms double, peak double"
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic media (test/bench input)
# ---------------------------------------------------------------------------

def synth_media(
    spark: SparkSession, n: int = 30, seed: int = 42, *, content_mode: str = "digest"
) -> DataFrame:
    """n rows cycling image/audio/video with deterministic binary
    payloads — the stand-in for a real media lake.

    ``content_mode="digest"`` (default): content is a 128-byte raw
    digest expansion — realistic opaque bytes.
    ``content_mode="ascii"``: content is the ASCII bytes of
    ``"{seed}:{i}"``. Same distributed path, but the fake codec's
    geometry (``sha256(content)`` digest bytes) becomes recomputable
    by any engine with a string sha256 — DuckDB's ``sha256(VARCHAR)``
    hashes identical bytes — which is what makes q86's oracle possible
    (raw-blob hashing is not expressible there)."""
    if content_mode not in ("digest", "ascii"):
        raise ValueError(f"unknown content_mode {content_mode!r}")
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        raw = f"{seed}:{i}".encode()
        content = raw if content_mode == "ascii" else hashlib.sha256(raw).digest() * 4
        meta = {
            "width": 640 if kind == "image" else None,
            "height": 480 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 3500 if kind == "video" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        }
        rows.append((i, kind, bytearray(content), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
