"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with vectorized Arrow batches.

The decode/feature-extract steps are STUBBED (image/audio libraries are
not in this container — see ``decode_image_batch``), but the Spark-side
plumbing is real and tested: schema, batching, partitioning, and the
mapInPandas/mapInArrow signatures are exactly what a real decoder would
drop into.

``binary_metadata`` is fully real (length, magic prefix, sha256) and
oracle-checked against DuckDB over the same bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "url string, n_bytes bigint, width int, height int, channels int, "
    "decoded boolean, note string"
)


def binary_metadata(df: DataFrame, col: str = "html") -> DataFrame:
    """Typed metadata over an opaque binary column — pure built-ins:
    (url, n_bytes, magic_hex, digest)."""
    return df.select(
        "url",
        F.length(F.col(col)).cast("bigint").alias("n_bytes"),
        F.hex(F.substring(F.col(col), 1, 4)).alias("magic_hex"),
        F.sha2(F.col(col), 256).alias("digest"),
    )


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB decode step (FIXTURES.md: image libs absent — deterministic
    fake preserving the real signature: bytes → (width, height,
    channels)).  A production build replaces the body with PIL/cv2 and
    nothing else changes."""
    n = payloads.map(
        lambda b: 0 if b is None else len(b)).to_numpy(dtype="int64")
    return pd.DataFrame({
        "n_bytes": n,
        # deterministic fake dims derived from the payload length
        "width": (n % 640 + 1).astype("int32"),
        "height": (n % 480 + 1).astype("int32"),
        "channels": pd.Series([3] * len(n), dtype="int32"),
        "decoded": [False] * len(n),
        "note": ["stub-decoder: deterministic fake dims"] * len(n),
    })


def extract_image_features(
    df: DataFrame, col: str = "html", batch_rows: int = 256,
) -> DataFrame:
    """mapInPandas pipeline over binary payloads — Arrow-batched, with
    explicit batch re-chunking so giant blobs can't blow a batch."""
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                feats = decode_image_batch(chunk[col])
                feats.insert(0, "url", chunk["url"].values)
                yield feats

    return df.select("url", col).mapInPandas(fn, IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = (
    "url string, n_bytes bigint, sample_rate int, n_samples bigint, "
    "duration_ms bigint, decoded boolean, note string"
)


def decode_audio_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB audio decode (no soundfile/ffmpeg in this container):
    deterministic fake header parse preserving the real signature —
    bytes → (sample_rate, n_samples, duration_ms).  A production
    build swaps the body for soundfile/librosa."""
    n = payloads.map(
        lambda b: 0 if b is None else len(b)).to_numpy(dtype="int64")
    rate = (16000 + (n % 3) * 8000).astype("int32")  # 16/24/32 kHz fake
    samples = n * 4  # fake: 4 samples per byte
    return pd.DataFrame({
        "n_bytes": n,
        "sample_rate": rate,
        "n_samples": samples,
        "duration_ms": (samples * 1000 // rate).astype("int64"),
        "decoded": [False] * len(n),
        "note": ["stub-decoder: deterministic fake audio meta"] * len(n),
    })


def extract_audio_features(
    df: DataFrame, col: str = "html", batch_rows: int = 256,
) -> DataFrame:
    """Same Arrow-batched mapInPandas shape as the image path."""
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                feats = decode_audio_batch(chunk[col])
                feats.insert(0, "url", chunk["url"].values)
                yield feats

    return df.select("url", col).mapInPandas(fn, AUDIO_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = (
    "url string, frame_idx int, frame_offset bigint, frame_sha256 string"
)


def frame_sample(
    df: DataFrame, col: str = "html", n_frames: int = 4,
    frame_chars: int = 4096,
) -> DataFrame:
    """Video frame-sampling plumbing: emit ``n_frames`` evenly-spaced
    windows per payload with their digests — the REAL Spark shape
    (explode-per-frame rows, deterministic offsets, one digest per
    window) with the codec decode left to a production ffmpeg UDF.
    Pure built-ins, no Python: offsets via sequence + floor, windows
    via substr, sha2 digest.  Windows are char-offsets over the
    utf-8-decoded payload so the DuckDB oracle (char-based substring)
    matches exactly; a real video build slices bytes instead."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias(
        "frame_idx")
    out = df.select(
        "url", F.decode(F.col(col), "utf-8").alias("_s"), idx)
    off = F.floor(
        F.col("frame_idx").cast("bigint")
        * F.length("_s").cast("bigint") / n_frames).cast("bigint")
    return out.select(
        "url",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        off.alias("frame_offset"),
        F.sha2(F.col("_s").substr(
            (off + 1).cast("int"), F.lit(frame_chars)), 256)
        .alias("frame_sha256"),
    )
