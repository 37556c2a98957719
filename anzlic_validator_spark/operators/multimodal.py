"""Multimodal binary-column plumbing: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

The audio path (functions/audio.py) is fully real; image/video decode needs
libraries this container doesn't ship (Pillow / ffmpeg), so those kernels
are STUBS — either a clearly-marked NotImplementedError or a deterministic
fake — while the Spark-side plumbing (schemas, ``mapInPandas`` batch shape,
partition sizing) is real and tested. Swap `_decode_image_kernel` /
`_sample_frames_kernel` for real decoders in a full container.

Scale notes: binary payloads ride Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads fits the
worker (64-128 MB is right for ~50 KB-5 MB objects). Never explode binary
columns through a shuffle — extract features first, shuffle the features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_DDL = (
    "key string, format string, width int, height int, channels int, err string"
)

IMAGE_FEATURES_DDL = "key string, mean_luma double, byte_entropy double, err string"

FRAME_SAMPLE_DDL = "key string, frame_idx int, frame binary, err string"


def _decode_image_kernel(payload: bytes) -> tuple[int, int, int]:
    """STUB — real image decode (PNG/JPEG) needs Pillow, absent here.

    Deterministic fake: parses our own 12-byte fake header
    (b'IMGX' + w:int32 + h:int32, channels fixed 3) so tests exercise the
    full plumbing; anything else raises as a real decoder would.
    """
    if payload[:4] == b"IMGX" and len(payload) >= 12:
        w = int.from_bytes(payload[4:8], "little")
        h = int.from_bytes(payload[8:12], "little")
        return w, h, 3
    raise NotImplementedError(
        "real image decoders (Pillow/libjpeg) are not available in this container"
    )


def image_metadata(df: DataFrame, key_col: str, bytes_col: str, fmt_col: str) -> DataFrame:
    """Decode image headers → (key, format, width, height, channels, err).

    mapInPandas: one Arrow batch in, one metadata batch out — the binary
    column never leaves the scan partition.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b, f in zip(pdf[key_col], pdf[bytes_col], pdf[fmt_col]):
                try:
                    w, h, c = _decode_image_kernel(bytes(b) if b is not None else b"")
                    rows.append({"key": str(k), "format": f, "width": w, "height": h,
                                 "channels": c, "err": None})
                except Exception as exc:  # noqa: BLE001 — per-row error isolation
                    rows.append({"key": str(k), "format": f, "width": None, "height": None,
                                 "channels": None, "err": str(exc)[:200]})
            yield pd.DataFrame(rows, columns=["key", "format", "width", "height",
                                              "channels", "err"])

    return df.select(key_col, bytes_col, fmt_col).mapInPandas(op, IMAGE_META_DDL)


def binary_features(df: DataFrame, key_col: str, bytes_col: str) -> DataFrame:
    """Cheap content features computable without any codec: byte entropy and
    mean byte value ('luma' proxy) — real numpy, vectorized per batch.
    Useful for corruption screens and dedup pre-filters on any modality."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[bytes_col]):
                if b is None or len(b) == 0:
                    rows.append({"key": str(k), "mean_luma": None,
                                 "byte_entropy": None, "err": "empty"})
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                p = counts[counts > 0] / arr.size
                rows.append({
                    "key": str(k),
                    "mean_luma": float(arr.mean()),
                    "byte_entropy": float(-(p * np.log2(p)).sum()),
                    "err": None,
                })
            yield pd.DataFrame(rows, columns=["key", "mean_luma", "byte_entropy", "err"])

    return df.select(key_col, bytes_col).mapInPandas(op, IMAGE_FEATURES_DDL)


def _sample_frames_kernel(payload: bytes, n_frames: int) -> list[bytes]:
    """STUB — real video frame sampling needs ffmpeg, absent here.

    Deterministic fake: splits the payload into n equal slices (the batch
    shape, schema and fan-out are exactly what a real ffmpeg kernel returns).
    """
    if not payload:
        raise ValueError("empty payload")
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def sample_frames(df: DataFrame, key_col: str, bytes_col: str, n_frames: int = 4) -> DataFrame:
    """Fan one video payload out to n frame rows (key, frame_idx, frame, err).

    The 1→n fan-out happens inside the partition (mapInPandas), so frame
    bytes never shuffle; downstream feature extraction runs on the frames
    in place."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[bytes_col]):
                try:
                    for i, frame in enumerate(_sample_frames_kernel(bytes(b or b""), n_frames)):
                        rows.append({"key": str(k), "frame_idx": i, "frame": frame, "err": None})
                except Exception as exc:  # noqa: BLE001
                    rows.append({"key": str(k), "frame_idx": -1, "frame": None,
                                 "err": str(exc)[:200]})
            yield pd.DataFrame(rows, columns=["key", "frame_idx", "frame", "err"])

    return df.select(key_col, bytes_col).mapInPandas(op, FRAME_SAMPLE_DDL)
