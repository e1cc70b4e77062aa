"""Deterministic image payloads: generate / encode / decode / phash / PSNR.

The container has no image libraries (no PIL/opencv), so — as the build
contract allows — the *codec* is a deterministic fake: a tiny self-describing
container ("SPNG" lossless via zlib, "SJPG" lossy via uniform quantization to
step 4, PSNR ≈ 46 dB vs the original, comfortably ≥ the 40 dB gate from
BASELINE.json input_hint). Everything AROUND the codec — binary columns,
schema, Arrow batch shape, vectorized decode/verify UDFs, phash — is real and
is what the Spark plumbing exercises. Swapping in a real codec is a two-
function change in this module.

All functions are numpy-vectorized-friendly: they take/return numpy arrays
and are called from pandas UDFs on whole Arrow batches (no per-row Python in
the Spark plan; the per-row loop here lives inside a batch function, the same
shape a real codec binding would have).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_LOSSLESS = b"SPNG"
MAGIC_LOSSY = b"SJPG"
_HEADER = struct.Struct(">4sHHB")  # magic, w, h, channels
_Q_STEP = 4  # lossy quantization step → PSNR ~46.4 dB


def seed_for(image_id: str) -> int:
    """Stable 64-bit seed from an id (FNV-1a); no Python hash() (salted)."""
    h = 0xCBF29CE484222325
    for b in image_id.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def make_pixels(image_id: str, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic RGB uint8 image (h, w, 3) from an id."""
    rng = np.random.default_rng(seed_for(image_id))
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # id-dependent low-frequency structure so phash is discriminative.
    # repeat×repeat is bit-identical to np.kron(blocks, ones(uint8)) —
    # kron multiplies each block by 1 — at ~4× less per-call cost (this
    # runs per IMAGE in the verify stage and every synth payload build)
    blocks = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    low = blocks.repeat(bh, axis=0).repeat(bw, axis=1)[:h, :w]
    return ((base.astype(np.uint16) + low[:, :, None].astype(np.uint16)) // 2).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, c = pixels.shape
    if fmt == "png":
        payload, magic = pixels, MAGIC_LOSSLESS
    elif fmt == "jpeg":
        payload = ((pixels // _Q_STEP) * _Q_STEP + _Q_STEP // 2).astype(np.uint8)
        magic = MAGIC_LOSSY
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return _HEADER.pack(magic, w, h, c) + zlib.compress(payload.tobytes(), 1)


def decode(data: bytes) -> np.ndarray:
    magic, w, h, c = _HEADER.unpack_from(data)
    if magic not in (MAGIC_LOSSLESS, MAGIC_LOSSY):
        raise ValueError("bad magic")
    raw = zlib.decompress(data[_HEADER.size:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)


def phash64(pixels: np.ndarray) -> int:
    """Average-hash: 8×8 block means vs global mean → signed int64."""
    gray = pixels.mean(axis=2)
    h, w = gray.shape
    if h < 8 or w < 8:
        # tiny images: edge-replicate up to 8×8 so the 8×8 blocking below
        # is always well-formed (previously a reshape crash for <8px inputs)
        gray = np.pad(gray, ((0, max(8 - h, 0)), (0, max(8 - w, 0))), mode="edge")
        h, w = gray.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    # packbits is MSB-first per byte, so from_bytes(..., 'big') is
    # bit-identical to the shift-or loop it replaces (~10× faster; this
    # runs per image in the verify stage)
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.int64(np.uint64(val)))  # wrap to signed for LongType


def make_pixels_batch(image_ids, w: int, h: int) -> np.ndarray:
    """Vectorized :func:`make_pixels` over n ids → (n, h, w, 3) uint8.

    Bit-identical to the per-row function (asserted by
    tests/test_images_batch.py): the per-id RNG draws are irreducibly
    per-row (independent seeded streams), but the low-frequency mix — the
    repeat/upcast/add/halve arithmetic, ~40% of per-row cost — runs once
    over the whole stack. Used by the Arrow verify stage (engine/verify.py)
    where per-row make_pixels was the reference-render hot loop.
    """
    n = len(image_ids)
    bases = np.empty((n, h, w, 3), dtype=np.uint8)
    blocks = np.empty((n, 8, 8), dtype=np.uint8)
    for i, iid in enumerate(image_ids):
        rng = np.random.default_rng(seed_for(str(iid)))
        # draw order matches make_pixels: base first, then blocks
        bases[i] = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blocks[i] = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    lows = blocks.repeat(bh, axis=1).repeat(bw, axis=2)[:, :h, :w]
    # identical arithmetic to make_pixels: uint16 add, floor-halve, uint8
    return ((bases.astype(np.uint16) + lows[:, :, :, None]) // 2).astype(np.uint8)


def _gray_f8(px: np.ndarray) -> np.ndarray:
    """float64 grayscale of a (..., 3) uint8 stack — bit-identical to
    ``pixels.mean(axis=-1)`` (same pairwise order: (r+g)+b then /3) at ~5x
    less cost than np.mean's buffered reduction."""
    return (px[..., 0].astype(np.float64) + px[..., 1] + px[..., 2]) / 3.0


def phash64_batch(px: np.ndarray) -> np.ndarray:
    """Vectorized :func:`phash64` over a (n, h, w, 3) uint8 stack → int64[n].

    Bit-identical to the per-row function: identical float64 reduction
    order for the gray/block/global means (property-tested), identical
    MSB-first bit packing. Images smaller than 8px on a side fall back to
    the per-row edge-pad path.
    """
    n, h, w, _ = px.shape
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if h < 8 or w < 8:
        return np.array([phash64(p) for p in px], dtype=np.int64)
    gray = _gray_f8(px)
    bh, bw = h // 8, w // 8
    blocks = np.ascontiguousarray(gray[:, : bh * 8, : bw * 8]).reshape(
        n, 8, bh, 8, bw).mean(axis=(2, 4))
    bits = blocks > blocks.mean(axis=(1, 2))[:, None, None]
    packed = np.packbits(bits.reshape(n, 64), axis=1)
    return packed.view(">u8")[:, 0].astype(np.int64)


def psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized :func:`psnr` over two (n, h, w, 3) uint8 stacks → f8[n].

    Exact: pixel diffs are integers |d| <= 255 (exact in float32), squares
    <= 65025 (exact), and the einsum accumulates in float64 where every
    partial sum of a steady batch's <= 2^53 integer total is exact — so the
    MSE equals the per-row float64 value regardless of summation order.
    """
    if len(a) == 0:
        return np.empty(0, dtype=np.float64)
    d = a.astype(np.float32) - b.astype(np.float32)
    npx = a.shape[1] * a.shape[2] * a.shape[3]
    sq = np.einsum("nijk,nijk->n", d, d, dtype=np.float64)
    mse = sq / npx
    with np.errstate(divide="ignore"):
        out = 10.0 * np.log10(255.0 ** 2 / np.where(mse == 0.0, np.nan, mse))
    return np.where(mse == 0.0, np.inf, out)


_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                         axis=1).sum(axis=1).astype(np.uint8)


def hamming64_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized :func:`hamming64` over int64/uint64 arrays → int64[n]
    (byte-table popcount; numpy 1.x has no bitwise_count)."""
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)
         ).view(np.uint8).reshape(-1, 8)
    return _POPCNT8[x].sum(axis=1).astype(np.int64)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def build_payload(image_id: str, w: int = 32, h: int = 32, fmt: str = "png",
                  caption: str = "") -> dict:
    """One IMAGES-schema row (BASELINE.json input_hint shape)."""
    px = make_pixels(image_id, w, h)
    return {
        "image_id": image_id,
        "bytes": encode(px, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash64(px),
    }
