"""Image codec plumbing for the north pipeline.

The sandbox has no image libraries (no PIL / cv2 / jpeg codec), so:

- **PNG is real**: a standards-compliant RGB8 PNG encoder/decoder written
  against the public PNG spec using only ``zlib`` + ``struct`` (filter
  type 0). Output opens in any viewer; decode(encode(x)) == x exactly.
- **JPEG is a clearly-marked deterministic stand-in** (`FJPG` magic): the
  pixel array is uniformly quantized (step 4 → PSNR ≈ 42.7 dB, exercising
  the "lossy format, PSNR ≥ 40 dB" acceptance path of the north rule) and
  zlib-compressed. Swap `encode_jpeg`/`decode_jpeg` for a real libjpeg
  binding in production; the Ray-side plumbing (binary column in/out,
  batch sizes, actor signature) is identical.

Also here: a deterministic 64-bit perceptual hash (mean-threshold 8×8
block hash — the dedup shuffle key per the north-rule input hint) and PSNR.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"
_JPEG_QUANT_STEP = 4


def _chunk(tag: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)


def encode_png(pixels: np.ndarray) -> bytes:
    """RGB8 HxWx3 uint8 → PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if not (raw[:, 0] == 0).all():
        # our encoder only emits filter 0; other filters unsupported here
        raise ValueError("unsupported PNG filter")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """DETERMINISTIC STAND-IN for a real JPEG encoder (see module doc)."""
    h, w, _ = pixels.shape
    q = (pixels // _JPEG_QUANT_STEP).astype(np.uint8)
    return _FJPG_MAGIC + struct.pack(">HH", w, h) + zlib.compress(q.tobytes(), 6)


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != _FJPG_MAGIC:
        raise ValueError("not a FJPG payload")
    w, h = struct.unpack(">HH", data[4:8])
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bin centers (max error step/2+1 → PSNR ≈ 42.7 dB @ step 4)
    return np.minimum(q.astype(np.uint16) * _JPEG_QUANT_STEP + _JPEG_QUANT_STEP // 2, 255).astype(np.uint8)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return decode_png(data) if fmt == "png" else decode_jpeg(data)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    return encode_png(pixels) if fmt == "png" else encode_jpeg(pixels)


def phash64(pixels: np.ndarray) -> int:
    """Deterministic 64-bit perceptual hash: grayscale → 8×8 block means →
    threshold by overall mean → bit-packed int64. Near-identical images
    (small noise) share the value — the dedup groupby key."""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # trim to a multiple of 8 then block-mean down to 8x8
    g = g[: h - h % 8 or h, : w - w % 8 or w]
    bh, bw = g.shape[0] // 8, g.shape[1] // 8
    blocks = g[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint8).ravel()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val  # int64 per the input-hint schema


def phash64_batch(pixel_list: list[np.ndarray]) -> np.ndarray:
    """Vectorized ``phash64`` over a batch: images are grouped by shape
    and each shape group hashes in ONE numpy pass (per-call kernel
    overhead dominates at thumbnail sizes — ~70 µs/image single vs ~5 µs
    batched). Bit-identical to ``phash64``."""
    n = len(pixel_list)
    out = np.empty(n, dtype=np.int64)
    by_shape: dict[tuple, list[int]] = {}
    for i, px in enumerate(pixel_list):
        by_shape.setdefault(px.shape, []).append(i)
    # chunk each shape group: a full-group float64 stack is tens of MB per
    # batch and, across 32 concurrent workers, saturates memory bandwidth
    # (measured: the unchunked variant made the whole pipeline ~40%
    # SLOWER despite winning a single-process microbench)
    chunk = 64
    for shape, idxs in by_shape.items():
        h, w = shape[0], shape[1]
        for c0 in range(0, len(idxs), chunk):
            sub = idxs[c0 : c0 + chunk]
            arr = np.stack([pixel_list[i] for i in sub]).astype(np.float64)
            g = arr.mean(axis=3)
            g = g[:, : h - h % 8 or h, : w - w % 8 or w]
            bh, bw = g.shape[1] // 8, g.shape[2] // 8
            blocks = g[:, : bh * 8, : bw * 8].reshape(len(sub), 8, bh, 8, bw).mean(axis=(2, 4))
            bits = (blocks > blocks.mean(axis=(1, 2), keepdims=True)).astype(np.uint8)
            packed = np.packbits(bits.reshape(len(sub), 64), axis=1)
            vals = packed.view(">u8")[:, 0].astype(np.uint64)
            out[sub] = vals.view(np.int64)
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)
