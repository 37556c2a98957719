"""Pure-numpy image codecs (PPM/PGM binary, BMP 24-bit) + transforms.

The container ships no image libraries (Pillow/libjpeg), so — exactly like
the FLAC codec in functions/flac.py — the uncompressed public formats are
implemented from their specs in numpy:

- PPM (``P6``) / PGM (``P5``): netpbm binary formats — ASCII header
  (magic, whitespace/comments, width, height, maxval ≤ 255) followed by
  raw samples, row-major, top-down.
- BMP: ``BM`` file header (14 bytes) + BITMAPINFOHEADER (40 bytes),
  uncompressed 24-bit BGR, rows padded to 4 bytes, bottom-up (positive
  height) or top-down (negative height).

Compressed formats (PNG/JPEG) stay honestly environment-stubbed in
operators/multimodal.py; register a real decoder there in a full container.

Everything raises ImageError on structural corruption so the Spark kernels
convert defects into per-row errors, never task failures (the same
contract as functions/audio.decode).
"""

from __future__ import annotations

import struct

import numpy as np


class ImageError(ValueError):
    """Structural defect in an image payload."""


# ------------------------------------------------------------- netpbm

def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6)."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ImageError(f"PPM wants HxWx3, got {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_pgm(img: np.ndarray) -> bytes:
    """HxW uint8 → binary PGM (P5)."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim != 2:
        raise ImageError(f"PGM wants HxW, got {a.shape}")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def _pnm_header(b: bytes, off: int, n_fields: int) -> tuple[list[int], int]:
    """Parse n whitespace-separated ints, skipping ``#`` comments."""
    fields: list[int] = []
    n = len(b)
    while len(fields) < n_fields:
        while off < n and b[off : off + 1].isspace():
            off += 1
        if off < n and b[off : off + 1] == b"#":
            while off < n and b[off] != 0x0A:
                off += 1
            continue
        start = off
        while off < n and not b[off : off + 1].isspace():
            off += 1
        tok = b[start:off]
        if not tok.isdigit():
            raise ImageError(f"bad PNM header token {tok[:12]!r}")
        fields.append(int(tok))
    if off >= n or not b[off : off + 1].isspace():
        raise ImageError("truncated PNM header")
    return fields, off + 1  # single whitespace byte ends the header


def decode_pnm(b: bytes) -> np.ndarray:
    """P5 → HxW uint8; P6 → HxWx3 uint8."""
    if b[:2] not in (b"P5", b"P6"):
        raise ImageError("not a binary PNM")
    channels = 3 if b[:2] == b"P6" else 1
    (w, h, maxval), off = _pnm_header(b, 2, 3)
    if maxval != 255:
        raise ImageError(f"unsupported PNM maxval {maxval} (only 8-bit)")
    if w <= 0 or h <= 0:
        raise ImageError(f"bad PNM dimensions {w}x{h}")
    need = w * h * channels
    data = b[off : off + need]
    if len(data) < need:
        raise ImageError("truncated PNM pixel data")
    arr = np.frombuffer(data, dtype=np.uint8)
    return arr.reshape(h, w, 3) if channels == 3 else arr.reshape(h, w)


# ---------------------------------------------------------------- BMP

_BMP_FILE_HDR = struct.Struct("<2sIHHI")       # magic, size, res, res, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → 24-bit bottom-up BMP."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ImageError(f"BMP wants HxWx3, got {a.shape}")
    h, w, _ = a.shape
    row = w * 3
    pad = (-row) % 4
    bgr = a[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    body = bytearray()
    zeros = b"\x00" * pad
    for r in bgr:
        body += r.tobytes() + zeros
    info = _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = _BMP_FILE_HDR.pack(b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + bytes(body)


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → HxWx3 uint8 (RGB); handles bottom-up and
    top-down (negative height) rows."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ImageError("not a BMP")
    _magic, _fsize, _r1, _r2, data_off = _BMP_FILE_HDR.unpack_from(b, 0)
    hdr_size, w, h, planes, bpp, comp = _BMP_INFO_HDR.unpack_from(b, 14)[:6]
    if hdr_size < 40:
        raise ImageError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or comp != 0 or bpp != 24:
        raise ImageError(f"unsupported BMP layout bpp={bpp} compression={comp}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ImageError(f"bad BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(b) < need:
        raise ImageError("truncated BMP pixel data")
    rows = np.frombuffer(b[data_off : data_off + stride * h], dtype=np.uint8)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


# ------------------------------------------------------------ dispatch

def decode_image(b: bytes) -> tuple[np.ndarray, str]:
    """Sniff + decode → (array, format). Raises ImageError on corruption,
    NotImplementedError for real-but-absent codecs (PNG/JPEG)."""
    if b is None or len(b) < 2:
        raise ImageError("empty or tiny payload")
    if b[:2] in (b"P5", b"P6"):
        return decode_pnm(b), "pgm" if b[:2] == b"P5" else "ppm"
    if b[:2] == b"BM":
        return decode_bmp(b), "bmp"
    if b[:8] == b"\x89PNG\r\n\x1a\n" or b[:2] == b"\xff\xd8":  # PNG sig / JPEG SOI
        raise NotImplementedError(
            "PNG/JPEG decoders are not available in this container — "
            "register one via operators/multimodal.register_image_decoder"
        )
    raise ImageError(f"unrecognized image magic {bytes(b[:4])!r}")


# ----------------------------------------------------------- transforms

def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index gather (any channel count)."""
    if out_w <= 0 or out_h <= 0:
        raise ImageError(f"bad target size {out_w}x{out_h}")
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def luma(img: np.ndarray) -> np.ndarray:
    """Rec.601 luma for HxWx3, identity for HxW."""
    if img.ndim == 2:
        return img.astype(np.float32)
    f = img.astype(np.float32)
    return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
