"""Pure-numpy FLAC codec (functions/flac.py) — bitstream-level checks.

The container has no reference flac binary; these tests pin the spec
structure (magic, STREAMINFO layout, frame sync, CRCs, MD5) byte-for-byte
against RFC 9639 so the output is verifiable by any conforming decoder.
"""

import hashlib
import struct

import numpy as np
import pytest

from anzlic_validator_spark.functions.flac import (
    BLOCKSIZE,
    FlacError,
    crc8,
    crc16,
    _crc16_bytewise,
    decode_flac,
    encode_flac,
)


def _sig(n, seed=0, amp=9000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(t * 0.07) + 150 * rng.standard_normal(n)).astype(np.int16)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 100, BLOCKSIZE - 1, BLOCKSIZE, BLOCKSIZE + 1, 20000])
def test_roundtrip_exact(n):
    x = _sig(n)
    y, sr = decode_flac(encode_flac(x, 16000))
    assert sr == 16000
    assert np.array_equal(x, y)


def test_roundtrip_extremes_and_constant():
    x = np.array([32767, -32768, 0, -1, 1] * 1000, dtype=np.int16)
    assert np.array_equal(decode_flac(encode_flac(x, 8000))[0], x)
    c = np.full(6000, -12345, dtype=np.int16)
    assert np.array_equal(decode_flac(encode_flac(c, 44100))[0], c)


def test_compresses_tonal_audio():
    x = _sig(32000)
    b = encode_flac(x, 16000)
    assert len(b) < 0.8 * 2 * len(x)  # fixed-order-2 + rice beats raw PCM


def test_stream_structure_per_spec():
    x = _sig(5000)
    b = encode_flac(x, 22050)
    assert b[:4] == b"fLaC"
    # metadata block header: last-block flag + type 0 (STREAMINFO), len 34
    assert b[4] == 0x80 and int.from_bytes(b[5:8], "big") == 34
    # STREAMINFO: min/max blocksize
    assert struct.unpack(">H", b[8:10])[0] == BLOCKSIZE
    assert struct.unpack(">H", b[10:12])[0] == BLOCKSIZE
    # sample rate: 20 bits starting at STREAMINFO byte 10
    assert (int.from_bytes(b[18:21], "big") >> 4) == 22050
    # MD5 of raw samples closes STREAMINFO
    assert b[26:42] == hashlib.md5(x.astype("<i2").tobytes()).digest()
    # first frame: sync code 0b11111111111110 + fixed-blocksize bit
    assert b[42] == 0xFF and b[43] == 0xF8


def test_corruption_always_detected():
    x = _sig(9000)
    b = encode_flac(x, 16000)
    # truncations at several depths
    for cut in [10, 40, len(b) // 3, len(b) // 2 | 1, len(b) - 2]:
        with pytest.raises(FlacError):
            decode_flac(b[:cut])
    # single bit flips anywhere in FRAME data (>= byte 42) must be caught by
    # CRC-8/CRC-16/MD5. (STREAMINFO carries no CRC in real FLAC either —
    # sample integrity is the guarantee, via frame CRCs + stream MD5.)
    for at in [5, 42, 44, len(b) // 2, len(b) - 5]:
        bb = bytearray(b)
        bb[at] ^= 0x10
        with pytest.raises(FlacError):
            decode_flac(bytes(bb))


def test_unsupported_layouts_rejected_explicitly():
    x = _sig(1000)
    b = bytearray(encode_flac(x, 16000))
    # STREAMINFO byte 20 (file byte 28... channels/bps live in byte 20 of
    # STREAMINFO = file byte 12+... easier: flip the channels-1 field via
    # bit surgery on byte 20 of STREAMINFO (offset 8+12=20): sr(20b) ends
    # mid-byte; channels-1 occupies the next 3 bits
    b[20 + 1] ^= 0b0010_0000  # bump channels-1 → stereo claim
    with pytest.raises(FlacError, match="unsupported layout|CRC|MD5|sync"):
        decode_flac(bytes(b))


def test_crc_primitives_match_reference_vectors():
    # CRC-8 poly 0x07 / CRC-16 poly 0x8005, MSB-first, init 0 — the spec's
    # published check values for '123456789'
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    rng = np.random.default_rng(3)
    for n in [0, 1, 63, 64, 65, 129, 4096, 10007]:
        d = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        assert crc16(d) == _crc16_bytewise(d)


def test_audio_codec_integration():
    """decode() in functions/audio.py surfaces FLAC errors as decode-check
    violations and reports the header sample rate even on payload damage."""
    from anzlic_validator_spark.functions.audio import decode, encode

    sig = np.clip(0.4 * np.sin(np.arange(4000) * 0.1), -1, 1).astype(np.float32)
    b = encode(sig, 16000, "flac")
    pcm, sr, err = decode(b, "flac")
    assert err is None and sr == 16000 and pcm.size == 4000
    # truncated payload: error, but embedded sr still reported
    pcm2, sr2, err2 = decode(b[: len(b) // 2 | 1], "flac")
    assert pcm2 is None and err2 is not None and sr2 == 16000


def test_decodes_method1_and_partitioned_residuals():
    """Externally-encoded FLAC may use 5-bit rice params (method 1) and
    partition orders > 0; our encoder never emits them, so craft a frame by
    hand with the module's own bit primitives and check the decoder."""
    import numpy as np

    from anzlic_validator_spark.functions import flac as fl

    rng = np.random.default_rng(9)
    bs = 4096
    x = (6000 * np.sin(np.arange(bs) * 0.03) + 80 * rng.standard_normal(bs)).astype(np.int16)

    # frame header identical to the encoder's
    hdr = bytearray([0xFF, 0xF8, (0b0111 << 4) | 0b0000, (0b0000 << 4) | (0b100 << 1)])
    hdr += fl._utf8_code(0)
    hdr += struct.pack(">H", bs - 1)
    hdr.append(fl.crc8(bytes(hdr)))

    order = 2
    blk = x.astype(np.int64)
    res = blk[order:] - 2 * blk[order - 1 : -1] + blk[: -order]
    zz = fl._zigzag(res)
    w = fl._BitWriter()
    w.write((0b001000 | order) << 1, 8)          # FIXED order 2
    for s in blk[:order]:
        w.write(int(s) & 0xFFFF, 16)
    w.write(0b01, 2)                              # residual method 1 (5-bit k)
    w.write(1, 4)                                 # partition order 1 → 2 partitions
    half = bs // 2
    parts = [zz[: half - order], zz[half - order :]]
    for part in parts:
        k = fl._best_k(part)
        w.write(k, 5)
        w.write_bits(fl._rice_bits(part, k))
    body = w.to_bytes()
    frame = bytes(hdr) + body
    frame += struct.pack(">H", fl.crc16(frame))

    si = fl._BitWriter()
    si.write(bs, 16); si.write(bs, 16); si.write(0, 24); si.write(0, 24)
    si.write(16000, 20); si.write(0, 3); si.write(15, 5); si.write(bs, 36)
    import hashlib as _h
    stream = fl.MAGIC + bytes([0x80, 0, 0, 34]) + si.to_bytes() \
        + _h.md5(x.astype("<i2").tobytes()).digest() + frame
    y, sr = fl.decode_flac(stream)
    assert sr == 16000 and np.array_equal(x, y)


def test_lpc_and_escape_rejected_explicitly():
    import numpy as np

    from anzlic_validator_spark.functions import flac as fl

    x = np.zeros(100, dtype=np.int16)
    b = bytearray(fl.encode_flac(x, 8000))
    # subframe header byte sits right after the 4-byte fixed header, the
    # 1-byte UTF-8 frame number, 2-byte blocksize and 1-byte CRC-8 of the
    # first frame (offset 42 + 8). Force LPC type bits (0b1xxxxx).
    sub_off = 42 + 8
    orig = b[sub_off]
    b[sub_off] = 0b0_100000_0  # LPC order 1
    with pytest.raises(fl.FlacError, match="LPC|CRC"):
        fl.decode_flac(bytes(b))
    b[sub_off] = orig
    fl.decode_flac(bytes(b))  # restored stream still decodes


def _handcraft_stream(x, sr, bs_code, bs, porder, method=0):
    """Craft a single-frame FLAC stream with explicit blocksize-code /
    partition-order fields (paths our encoder never emits)."""
    import hashlib as _h

    from anzlic_validator_spark.functions import flac as fl

    order = 2
    hdr = bytearray([0xFF, 0xF8, (bs_code << 4) | 0b0000, (0b0000 << 4) | (0b100 << 1)])
    hdr += fl._utf8_code(0)
    if bs_code == 0b0110:
        hdr += struct.pack(">B", bs - 1)
    elif bs_code == 0b0111:
        hdr += struct.pack(">H", bs - 1)
    hdr.append(fl.crc8(bytes(hdr)))

    blk = x.astype(np.int64)
    res = blk[order:] - 2 * blk[order - 1 : -1] + blk[: -order]
    zz = fl._zigzag(res)
    w = fl._BitWriter()
    w.write((0b001000 | order) << 1, 8)  # FIXED order 2
    for s in blk[:order]:
        w.write(int(s) & 0xFFFF, 16)
    w.write(method, 2)
    w.write(porder, 4)
    pbits = 4 if method == 0 else 5
    nparts = 1 << porder
    offs = [0]
    for p in range(nparts):
        cnt = max(bs // nparts - (order if p == 0 else 0), 0)
        offs.append(offs[-1] + cnt)
    for p in range(nparts):
        part = zz[offs[p] : offs[p + 1]]
        k = fl._best_k(part) if len(part) else 0
        w.write(k, pbits)
        w.write_bits(fl._rice_bits(part, k))
    frame = bytes(hdr) + w.to_bytes()
    frame += struct.pack(">H", fl.crc16(frame))

    si = fl._BitWriter()
    si.write(bs, 16); si.write(bs, 16); si.write(0, 24); si.write(0, 24)
    si.write(sr, 20); si.write(0, 3); si.write(15, 5); si.write(len(x), 36)
    return (fl.MAGIC + bytes([0x80, 0, 0, 34]) + si.to_bytes()
            + _h.md5(x.astype("<i2").tobytes()).digest() + frame)


def test_blocksize_code_192_accepted():
    """RFC 9639 §9.1.1: bs_code 0b0001 = 192 samples is a valid fixed
    blocksize our encoder never emits; foreign streams may use it
    (ADVICE r02 low, flac.py:435)."""
    from anzlic_validator_spark.functions import flac as fl

    x = _sig(192, seed=5)
    y, sr = fl.decode_flac(_handcraft_stream(x, 16000, bs_code=0b0001, bs=192, porder=0))
    assert sr == 16000 and np.array_equal(x, y)


def test_porder_defect_is_flac_error_not_valueerror():
    """ADVICE r02 (high): partition-order bits are NOT covered by the header
    CRC-8, so a corrupt porder can make bs//nparts < order — must raise
    FlacError (a per-row violation), never a bare numpy ValueError that
    would fail the whole Spark task."""
    from anzlic_validator_spark.functions import flac as fl

    x = _sig(4096, seed=6)
    # porder 12 → 4096 partitions of 1 sample each: first partition count
    # would be 1 - order = -1
    b = _handcraft_stream(x, 16000, bs_code=0b0111, bs=4096, porder=12)
    with pytest.raises(fl.FlacError, match="partition shorter"):
        fl.decode_flac(b)


def test_every_single_bit_flip_contained_by_audio_decode():
    """Exhaustive robustness: flip EVERY bit of a valid stream one at a time;
    audio.decode must always return a (pcm, sr, err) tuple — a structural
    defect is a per-row violation, never an exception escaping the Arrow UDF."""
    from anzlic_validator_spark.functions.audio import decode, encode

    sig = np.clip(0.4 * np.sin(np.arange(700) * 0.11), -1, 1).astype(np.float32)
    b = bytearray(encode(sig, 8000, "flac"))
    for byte_at in range(len(b)):
        for bit in (0x01, 0x10, 0x80):
            b[byte_at] ^= bit
            pcm, _sr, err = decode(bytes(b), "flac")
            assert (pcm is None) == (err is not None)
            b[byte_at] ^= bit
