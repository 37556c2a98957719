"""Multimodal binary-column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

Like the audio path (functions/audio.py + the pure-numpy FLAC codec), the
UNCOMPRESSED public image formats are fully real — PPM/PGM/BMP decode,
nearest-neighbor resize, Rec.601 luma (functions/image.py) — and video
frame sampling is real for concatenated-PNM streams (each frame
self-describing). Only the compressed codecs this container cannot ship
(PNG/JPEG via libjpeg, real containers via ffmpeg) remain honestly
environment-stubbed: ``register_image_decoder`` is the extension point a
full container uses, mirroring functions/audio.register_codec.

Scale notes: binary payloads ride Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads fits the
worker (64-128 MB is right for ~50 KB-5 MB objects). Never explode binary
columns through a shuffle — extract features first, shuffle the features
(tests/test_engine.py pins the never-shuffle-binary invariant for audio).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from anzlic_validator_spark.functions.image import (
    decode_image,
    encode_ppm,
    luma,
    resize_nearest,
)

IMAGE_META_DDL = (
    "key string, format string, width int, height int, channels int, err string"
)

IMAGE_FEATURES_DDL = "key string, mean_luma double, byte_entropy double, err string"

DECODED_FEATURES_DDL = (
    "key string, format string, width int, height int, mean_luma double, err string"
)

RESIZE_DDL = "key string, width int, height int, payload binary, err string"

FRAME_SAMPLE_DDL = "key string, frame_idx int, frame binary, err string"

# codec extension point: name → decode_fn(bytes) -> (ndarray, format_str);
# snapshot into kernels at op-construction time so driver-side registration
# reaches the Python workers (same mechanism as audio.make_decode_check_udf)
_IMAGE_DECODERS: dict[str, object] = {}


def register_image_decoder(name: str, decode_fn) -> None:
    """Add a decoder for payloads whose sniffing decode_image rejects —
    both absent codecs (PNG/JPEG in a container with Pillow) and formats
    the built-ins don't recognize at all (GIF, WebP, ...).
    ``decode_fn(bytes)`` → (HxW[xC] uint8 ndarray, format string); raise on
    corruption."""
    _IMAGE_DECODERS[str(name)] = decode_fn


_IMGX_MAX_PIXELS = 1 << 26  # 64M px ≈ 192 MB decoded — reject beyond


def _decode_image_kernel(payload: bytes, extra_decoders: dict) -> tuple[np.ndarray, str]:
    """Real decode for PPM/PGM/BMP (functions/image.py), plus the legacy
    12-byte IMGX test header (returns a synthetic array of the declared
    shape), plus any registered decoders; PNG/JPEG raise the documented
    environment NotImplementedError from decode_image.

    IMGX dimensions are BOUNDED before allocating: payloads are untrusted,
    and an arbitrary-binary row whose first bytes spell IMGX must become a
    per-row error, never an allocation that OOM-kills the worker."""
    from anzlic_validator_spark.functions.image import ImageError

    if payload[:4] == b"IMGX" and len(payload) >= 12:
        w = int.from_bytes(payload[4:8], "little")
        h = int.from_bytes(payload[8:12], "little")
        if not (0 < w <= 65535 and 0 < h <= 65535 and w * h <= _IMGX_MAX_PIXELS):
            raise ImageError(f"IMGX dimensions out of bounds: {w}x{h}")
        return np.zeros((h, w, 3), dtype=np.uint8), "imgx"
    try:
        return decode_image(payload)
    except (NotImplementedError, ImageError):
        # registered decoders get a shot at anything the built-in sniffing
        # rejects — absent codecs (PNG/JPEG) AND unrecognized magics
        # (GIF/WebP/...) alike, per register_image_decoder's contract
        for fn in extra_decoders.values():
            try:
                return fn(payload)
            except Exception:  # noqa: BLE001 — try next registered decoder
                continue
        raise


def image_metadata(df: DataFrame, key_col: str, bytes_col: str, fmt_col: str) -> DataFrame:
    """Decode image headers → (key, format, width, height, channels, err);
    format is the SNIFFED format (ppm/pgm/bmp/imgx/...), not the claimed
    column — disagreement is itself a useful validation signal.

    mapInPandas: one Arrow batch in, one metadata batch out — the binary
    column never leaves the scan partition.
    """
    decoders = dict(_IMAGE_DECODERS)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b, f in zip(pdf[key_col], pdf[bytes_col], pdf[fmt_col]):
                try:
                    arr, fmt = _decode_image_kernel(
                        bytes(b) if b is not None else b"", decoders
                    )
                    c = 1 if arr.ndim == 2 else int(arr.shape[2])
                    rows.append({"key": str(k), "format": fmt,
                                 "width": int(arr.shape[1]), "height": int(arr.shape[0]),
                                 "channels": c, "err": None})
                except Exception as exc:  # noqa: BLE001 — per-row error isolation
                    rows.append({"key": str(k), "format": f, "width": None, "height": None,
                                 "channels": None, "err": str(exc)[:200]})
            yield pd.DataFrame(rows, columns=["key", "format", "width", "height",
                                              "channels", "err"])

    return df.select(key_col, bytes_col, fmt_col).mapInPandas(op, IMAGE_META_DDL)


def decoded_image_features(df: DataFrame, key_col: str, bytes_col: str) -> DataFrame:
    """Pixel-domain features from REAL decode → (key, format, width, height,
    mean_luma, err); mean_luma is Rec.601 over decoded pixels (not the byte
    proxy binary_features computes)."""
    decoders = dict(_IMAGE_DECODERS)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[bytes_col]):
                try:
                    arr, fmt = _decode_image_kernel(
                        bytes(b) if b is not None else b"", decoders
                    )
                    rows.append({"key": str(k), "format": fmt,
                                 "width": int(arr.shape[1]), "height": int(arr.shape[0]),
                                 "mean_luma": float(luma(arr).mean()), "err": None})
                except Exception as exc:  # noqa: BLE001
                    rows.append({"key": str(k), "format": None, "width": None,
                                 "height": None, "mean_luma": None, "err": str(exc)[:200]})
            yield pd.DataFrame(rows, columns=["key", "format", "width", "height",
                                              "mean_luma", "err"])

    return df.select(key_col, bytes_col).mapInPandas(op, DECODED_FEATURES_DDL)


def resize_images(
    df: DataFrame, key_col: str, bytes_col: str, out_w: int, out_h: int
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (PPM; grayscale inputs
    are stacked to 3 channels) → (key, width, height, payload, err). The
    decode/transform/encode round-trip happens inside the scan partition —
    resized payloads, not originals, are what any downstream stage sees."""
    decoders = dict(_IMAGE_DECODERS)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[bytes_col]):
                try:
                    arr, _fmt = _decode_image_kernel(
                        bytes(b) if b is not None else b"", decoders
                    )
                    small = resize_nearest(arr, out_w, out_h)
                    if small.ndim == 2:
                        small = np.stack([small] * 3, axis=2)
                    rows.append({"key": str(k), "width": out_w, "height": out_h,
                                 "payload": encode_ppm(small), "err": None})
                except Exception as exc:  # noqa: BLE001
                    rows.append({"key": str(k), "width": None, "height": None,
                                 "payload": None, "err": str(exc)[:200]})
            yield pd.DataFrame(rows, columns=["key", "width", "height", "payload", "err"])

    return df.select(key_col, bytes_col).mapInPandas(op, RESIZE_DDL)


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


def _split_pnm_stream(payload: bytes) -> list[bytes]:
    """Frame boundaries of a concatenated binary-PNM stream (each frame is
    self-describing: header declares its own pixel count)."""
    from anzlic_validator_spark.functions.image import ImageError, _pnm_header

    frames = []
    off = 0
    n = len(payload)
    while off < n:
        magic = payload[off : off + 2]
        if magic not in (b"P5", b"P6"):
            raise ImageError(f"bad frame magic {bytes(magic)!r} at offset {off}")
        (w, h, maxval), data_off = _pnm_header(payload, off + 2, 3)
        if maxval != 255 or w <= 0 or h <= 0:
            raise ImageError("bad frame header")
        end = data_off + w * h * (3 if magic == b"P6" else 1)
        if end > n:
            raise ImageError("truncated frame")
        frames.append(payload[off:end])
        off = end
    if not frames:
        raise ImageError("empty stream")
    return frames


def _sample_frames_kernel(payload: bytes, n_frames: int) -> list[bytes]:
    """REAL for concatenated binary-PNM streams (motion-PNM: the simplest
    public self-describing frame container): parse every frame boundary,
    return n_frames evenly spaced frames, each a standalone decodable
    image. Real containers (mp4/webm) need ffmpeg, absent here — such
    payloads fall back to deterministic byte slicing so the fan-out
    plumbing stays exercised (the slices are NOT decodable frames and are
    labeled by the caller's err column when decoded downstream).
    """
    if not payload:
        raise ValueError("empty payload")
    if payload[:2] in (b"P5", b"P6"):
        frames = _split_pnm_stream(payload)
        n = len(frames)
        take = min(n_frames, n)
        idxs = [(i * n) // take for i in range(take)]
        return [frames[i] for i in idxs]
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
