"""Pure-numpy image codecs + PSNR + 64-bit perceptual hash.

The sandbox has NO imaging libraries (no PIL/cv2/imageio — SURVEY.md §0.4),
so the render stage uses three self-contained codecs over uint8 RGB arrays:

* ``raw``    — header + raw RGB bytes (lossless)
* ``png``    — real, standards-compliant PNG (8-bit RGB, filter 0, zlib)
               readable by any external PNG decoder (lossless)
* ``qlossy`` — our quantizing lossy codec: 6-bit channel quantization +
               zlib.  Max per-channel error is 2, so PSNR >= ~46 dB —
               comfortably above the BASELINE.json:L15 gate of 40 dB.

phash is the classic 8x8-DCT sign hash (mean-threshold on the low-frequency
block), returned as int64 for the ``images.phash bigint`` column
(input_hint, BASELINE.json:L15).

In RENDLER the render output was a PhantomJS screenshot PNG written to disk
[upstream: python/render_executor.py ~L40-80; python/render.js]; here images
are ``bytes binary`` column values produced inside pandas UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "png", "qlossy")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------- raw


def encode_raw(px: np.ndarray) -> bytes:
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    return b"RAW0" + struct.pack(">II", w, h) + px.tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != b"RAW0":  # ValueError, not assert: survives python -O
        raise ValueError("not a RAW0 blob")
    w, h = struct.unpack(">II", data[4:12])
    return np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------- raw video
#
# Uncompressed video is the one moving-picture format that needs no
# external codec (the mp4/webm family stubs behind
# multimodal.EXTERNAL_VIDEO_FORMATS) — same split as audio, where
# pcm16/wav decode for real and mp3/flac stub.


def encode_rawvideo(frames: np.ndarray) -> bytes:
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return b"VID0" + struct.pack(">III", w, h, n) + frames.tobytes()


def decode_rawvideo(data: bytes) -> np.ndarray:
    if data[:4] != b"VID0":  # ValueError, not assert: survives python -O
        raise ValueError("not a VID0 blob")
    w, h, n = struct.unpack(">III", data[4:16])
    return np.frombuffer(data[16:], dtype=np.uint8).reshape(n, h, w, 3)


# ---------------------------------------------------------------- png


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Minimal real PNG: 8-bit RGB, no interlace, filter type 0 scanlines."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend the filter byte (0 = None) to every scanline, vectorized
    scan = np.empty((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
            assert (depth, color, interlace) == (8, 2, 0), "unsupported PNG flavor"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    scan = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    assert (scan[:, 0] == 0).all(), "only filter 0 supported (our encoder's output)"
    return scan[:, 1:].reshape(h, w, 3).copy()


# ---------------------------------------------------------------- qlossy


def encode_qlossy(px: np.ndarray) -> bytes:
    """Quantize each channel to 6 bits (values 0..63), zlib-compress.

    Reconstruction maps q -> q*4 + 2, so |err| <= 2 per channel and
    PSNR >= 20*log10(255/sqrt(1.5)) ≈ 46.4 dB (gate: 40 dB).
    """
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    q = (px >> 2).astype(np.uint8)
    return b"QLS0" + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qlossy(data: bytes) -> np.ndarray:
    assert data[:4] == b"QLS0"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return (q << 2) + np.uint8(2)


_ENC = {"raw": encode_raw, "png": encode_png, "qlossy": encode_qlossy}
_DEC = {"raw": decode_raw, "png": decode_png, "qlossy": decode_qlossy}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENC[fmt](px)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DEC[fmt](data)


# ---------------------------------------------------------------- metrics


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


# ---------------------------------------------------------------- phash

_N = 32
_DCT = np.cos(np.pi / _N * (np.arange(_N)[:, None] + 0.5) * np.arange(_N)[None, :]).T
# _DCT[k, n] = cos(pi/N * (n+0.5) * k)  -> X = _DCT @ x  (DCT-II, unnormalized)


def phash(px: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale -> 32x32 -> DCT-II -> sign of the
    top-left 8x8 low-frequency block (minus DC) vs its median.

    Returned as signed int64 (Spark LongType / input_hint ``phash:int64``).
    """
    h, w = px.shape[:2]
    yi = (np.arange(_N) * h) // _N
    xi = (np.arange(_N) * w) // _N
    # subsample BEFORE the grayscale mean: the mean of the same 3 channel
    # values is computed either way (bit-identical), but only over the
    # 32x32 sample grid instead of the full image
    small = px[np.ix_(yi, xi)].astype(np.float64).mean(axis=2)
    freq = _DCT @ small @ _DCT.T
    block = freq[:8, :8].flatten()
    med = np.median(block[1:])  # exclude DC from the threshold
    # packbits is MSB-first, matching the old shift-or loop exactly
    return int.from_bytes(np.packbits(block > med).tobytes(), "big", signed=True)
