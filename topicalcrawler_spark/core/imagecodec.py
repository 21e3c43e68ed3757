"""Image codecs + perceptual hash — numpy + stdlib only (no PIL in-sandbox).

Formats (FIXTURES.md F1):
* ``ppm``  — binary P6, lossless.
* ``png``  — stdlib-zlib PNG, 8-bit RGB (color type 2). We *encode* with
  filter 0 but the decoder implements all five standard filter types
  (None/Sub/Up/Average/Paeth) per the public PNG spec (RFC 2083).
* ``qraw`` — the deliberate **lossy** format: per-channel 6-bit
  quantization inside a P6 container ("QR6m" magic), exercising the
  PSNR≥40dB invariant path (``BASELINE.json:15``) with real loss
  (max error 2/channel → PSNR ≈ 47 dB, comfortably above the gate
  but genuinely lossy).

``phash64`` is a standard 64-bit DCT perceptual hash (public algorithm):
luma → 32×32 area-mean resample → 2-D DCT-II via matrix multiply (no
scipy) → top-left 8×8 coefficients (skipping DC) vs their median →
64-bit signature. Deterministic float64 on a fixed platform; both the
engine's Arrow-batch UDF (U4) and fixture generation call this exact
function.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- pixels


def make_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB test image: gradient + noise (FIXTURES.md F1)."""
    rng = np.random.default_rng(seed)
    yy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    xx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    base = np.stack(
        [
            (yy + xx) / 2.0,
            np.broadcast_to(xx, (h, w)),
            np.broadcast_to(yy, (h, w)),
        ],
        axis=-1,
    )
    noise = rng.integers(-24, 25, size=(h, w, 3)).astype(np.float64)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    # header: magic, width, height, maxval — whitespace separated
    parts, pos = [], 2
    while len(parts) < 3:
        while data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while not data[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()  # filter byte 0 per scanline
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a png")
    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported png variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    out = np.empty((h, stride), np.uint8)
    bpp = 3
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                out[y, x] = (
                    int(line[x]) + int(_paeth(
                        np.uint8(left), prev[x : x + 1][0], np.uint8(ul)
                    ))
                ) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------- qraw (lossy)

_QRAW_MAGIC = b"QR6m"


def encode_qraw(pixels: np.ndarray) -> bytes:
    """6-bit per-channel quantization — the lossy PSNR-path format."""
    h, w, _ = pixels.shape
    q = (pixels >> 2).astype(np.uint8)  # 6-bit codes
    return _QRAW_MAGIC + struct.pack(">II", w, h) + q.tobytes()


def decode_qraw(data: bytes) -> np.ndarray:
    if not data.startswith(_QRAW_MAGIC):
        raise ValueError("not qraw")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(data, np.uint8, count=w * h * 3, offset=12).reshape(h, w, 3)
    # bit-replication reconstruction: x*4 + x>>4 spreads codes over 0..255
    return ((q.astype(np.uint16) << 2) | (q >> 4)).astype(np.uint8)


# ---------------------------------------------------------------- dispatch

FORMATS = ("ppm", "png", "qraw")
LOSSLESS = {"ppm": True, "png": True, "qraw": False}

_ENC = {"ppm": encode_ppm, "png": encode_png, "qraw": encode_qraw}
_DEC = {"ppm": decode_ppm, "png": decode_png, "qraw": decode_qraw}


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    return _ENC[fmt](pixels)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DEC[fmt](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------- phash

_DCT32 = None


def _dct_matrix() -> np.ndarray:
    # 32×32 only, by design (the phash pipeline's one size) — a size
    # parameter here would silently return the cached 32×32 matrix for
    # any other requested n once warm
    global _DCT32
    if _DCT32 is None:
        n = 32
        k = np.arange(n)[:, None].astype(np.float64)
        i = np.arange(n)[None, :].astype(np.float64)
        _DCT32 = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    return _DCT32


def _resample32(gray: np.ndarray) -> np.ndarray:
    """Area-mean resample to 32×32 via index-bucketed averaging.

    Implemented with ``np.bincount`` over the flattened bucket index
    (4.4× faster than the equivalent ``np.add.at`` scatter).  Bucket
    sums are integers exactly representable in float64, so the result
    is bit-identical regardless of accumulation order — the phash
    values this feeds are fixture-load-bearing and must not drift.
    """
    h, w = gray.shape
    ys = (np.arange(h) * 32) // h
    xs = (np.arange(w) * 32) // w
    idx = (ys[:, None] * 32 + xs[None, :]).ravel()
    sums = np.bincount(idx, weights=gray.ravel().astype(np.float64), minlength=1024)
    cnts = np.bincount(idx, minlength=1024)
    return (sums / np.maximum(cnts, 1.0)).reshape(32, 32)


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64, Spark LongType)."""
    # integer luma — deterministic
    luma = (
        pixels[..., 0].astype(np.int64) * 299
        + pixels[..., 1].astype(np.int64) * 587
        + pixels[..., 2].astype(np.int64) * 114
    ) // 1000
    small = _resample32(luma)
    d = _dct_matrix()
    dct = d @ small @ d.T
    block = dct[:8, :8].copy().ravel()
    # medians via np.partition — exact np.median equivalents (odd 63:
    # middle element; even 64: mean of the two middles) without the
    # ~6x _ureduce wrapper overhead; phash values are fixture-load-
    # bearing, so only bit-identical rewrites are allowed here
    block[0] = np.partition(block[1:], 31)[31]  # neutralize DC
    p = np.partition(block, (31, 32))
    med = (p[31] + p[32]) / 2.0
    bits = (block > med).astype(np.uint8)
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & ((1 << 64) - 1)).count("1"))
