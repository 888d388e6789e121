"""Pure-numpy image codecs + perceptual hash + PSNR.

The environment has no PIL/opencv (SURVEY.md §7.0), so the engine carries
minimal codecs for the formats used by the synthetic images table
(FIXTURES.md §1):

- 'ppm'  — binary PPM (P6), lossless, exact decode.
- 'png'  — real PNG container (zlib deflate, filter 0), lossless. Any PNG
           reader can decode our output; our decoder handles filters 0-2
           (what we emit is filter 0).
- 'qjpg' — a deterministic stand-in for lossy JPEG: uniform quantization
           (step 4) + zlib. Quantization RMS ~= 4/sqrt(12) -> PSNR ~= 47 dB,
           comfortably above the >=40 dB verification bar (BASELINE.json
           input_hint). Real JPEG decode would live behind the same
           interface on a cluster with codec libs.

All functions are numpy-array-in / bytes-out so they can run inside
mapInPandas over Arrow batches (no per-row Python UDFs in Spark plans; the
per-row loop lives inside the batch function, which is the standard shape
for opaque binary payloads).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --- PPM (P6) ---


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, whitespace-separated w h maxval, single whitespace, raster
    parts = data.split(b"\n", 3)
    w, h = (int(t) for t in parts[1].split())
    raster = parts[3] if len(parts) == 4 else b""
    arr = np.frombuffer(raster[: w * h * 3], dtype=np.uint8)
    return arr.reshape(h, w, 3).copy()


# --- PNG (8-bit RGB, filter 0 on encode; 0/1/2 on decode) ---


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    rows = pixels.astype(np.uint8)
    scanlines = np.concatenate([np.zeros((h, 1), np.uint8), rows.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(scanlines.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("decoder handles 8-bit RGB only")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int16)
    out = np.zeros((h, w * 3), dtype=np.int16)
    for r in range(h):
        f = filters[r]
        line = lines[r].copy()
        if f == 0:
            out[r] = line
        elif f == 1:  # Sub
            for c in range(w * 3):
                left = out[r, c - 3] if c >= 3 else 0
                out[r, c] = (line[c] + left) & 0xFF
        elif f == 2:  # Up
            up = out[r - 1] if r > 0 else 0
            out[r] = (line + up) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {f} not supported by mini-decoder")
    return out.astype(np.uint8).reshape(h, w, 3)


# --- qjpg (deterministic lossy stand-in) ---

_QSTEP = 4


def encode_qjpg(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int32) // _QSTEP).astype(np.uint8)
    return b"QJPG" + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qjpg(data: bytes) -> np.ndarray:
    if not data.startswith(b"QJPG"):
        raise ValueError("not a QJPG")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).astype(np.int32)
    # reconstruct at bin centers to minimize quantization error
    px = np.clip(q * _QSTEP + _QSTEP // 2, 0, 255).astype(np.uint8)
    return px.reshape(h, w, 3).copy()


_ENCODERS = {"ppm": encode_ppm, "png": encode_png, "qjpg": encode_qjpg}
_DECODERS = {"ppm": decode_ppm, "png": decode_png, "qjpg": decode_qjpg}
LOSSLESS_FMTS = {"ppm", "png"}


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    try:
        return _ENCODERS[fmt](pixels)
    except KeyError:
        raise NotImplementedError(
            f"format {fmt!r}: real codec libs are absent in this container; "
            "plug a decoder into _DECODERS on a cluster image"
        ) from None


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    try:
        return _DECODERS[fmt](data)
    except KeyError:
        raise NotImplementedError(
            f"format {fmt!r}: real codec libs are absent in this container; "
            "plug a decoder into _DECODERS on a cluster image"
        ) from None


# --- metrics ---


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale -> 32x32 block-mean resize -> 2D DCT
    -> top-left 8x8 (minus DC) sign-vs-median bits."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # block-mean resize to 32x32 via integral areas (works for any h, w)
    ys = (np.arange(33) * h / 32).astype(int)
    xs = (np.arange(33) * w / 32).astype(int)
    small = np.empty((32, 32))
    for r in range(32):
        for c in range(32):
            block = gray[ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)]
            small[r, c] = block.mean()
    dct = _DCT32 @ small @ _DCT32.T
    low = dct[:8, :8].flatten()[1:]  # drop DC
    med = np.median(low)
    bits = (low > med).astype(np.uint64)
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out - (1 << 64) if out >= (1 << 63) else out  # int64 two's-complement view
