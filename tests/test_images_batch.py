"""Bit-identity of the vectorized image primitives vs their per-row twins.

engine/verify.py's Arrow stage (the north-rule per-row invariant) now runs
PSNR/phash/hamming/render-mix vectorized over same-shape stacks; these tests
pin that every batch function is EXACTLY equal to the per-row reference
implementation — a single flipped phash bit would break the verify gate's
parity with payloads built by the per-row path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pttcrawler_spark.engine import verify as V
from pttcrawler_spark.synth import images as img

# make_pixels supports dims that are <=8 or multiples of 8 (block repeat);
# phash supports ANY dims — tested on random stacks incl. the pad fallback
SIZES = [(64, 64), (32, 48), (48, 32), (40, 56), (8, 8), (6, 8)]
PHASH_SIZES = SIZES + [(20, 12), (6, 10), (9, 9)]


def _ids(n, tag=""):
    return [f"batchtest{tag}{i:05d}" for i in range(n)]


@pytest.mark.parametrize("w,h", SIZES)
def test_make_pixels_batch_identical(w, h):
    ids = _ids(64, f"mp{w}x{h}")
    got = img.make_pixels_batch(ids, w, h)
    assert got.shape == (64, h, w, 3) and got.dtype == np.uint8
    for i, iid in enumerate(ids):
        assert np.array_equal(got[i], img.make_pixels(iid, w, h)), iid


@pytest.mark.parametrize("w,h", PHASH_SIZES)
def test_phash64_batch_identical(w, h):
    rng = np.random.default_rng(w * 1000 + h)
    px = rng.integers(0, 256, size=(128, h, w, 3), dtype=np.uint8)
    got = img.phash64_batch(px)
    want = np.array([img.phash64(p) for p in px], dtype=np.int64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("w,h", SIZES)
@pytest.mark.parametrize("fmt", ["png", "jpeg"])
def test_psnr_batch_identical(w, h, fmt):
    ids = _ids(64, f"ps{fmt}{w}x{h}")
    ref = np.stack([img.make_pixels(i, w, h) for i in ids])
    dec = np.stack([img.decode(img.encode(p, fmt)) for p in ref])
    got = img.psnr_batch(ref, dec)
    want = np.array([img.psnr(a, b) for a, b in zip(ref, dec)])
    fin = np.isfinite(want)
    assert np.array_equal(got[fin], want[fin])          # exact, not approx
    assert np.all(np.isinf(got[~fin])) and np.all(got[~fin] > 0)


def test_hamming64_batch_identical():
    rng = np.random.default_rng(7)
    a = rng.integers(-(2 ** 63), 2 ** 63 - 1, size=500, dtype=np.int64)
    b = rng.integers(-(2 ** 63), 2 ** 63 - 1, size=500, dtype=np.int64)
    b[::7] = a[::7]  # exercise distance-0
    got = img.hamming64_batch(a, b)
    want = np.array([img.hamming64(int(x), int(y)) for x, y in zip(a, b)])
    assert np.array_equal(got, want)


def _verify_rows_per_row(pdf: pd.DataFrame) -> pd.DataFrame:
    """The pre-vectorization per-row verify loop, kept as the test oracle."""
    n = len(pdf)
    psnr_db = np.full(n, np.nan)
    pixel_ok = np.zeros(n, dtype=bool)
    phash_ok = np.zeros(n, dtype=bool)
    caption_ok = (pdf["caption"].fillna("").to_numpy()
                  == pdf["expected_caption"].fillna("").to_numpy())
    for i in range(n):
        b = pdf["bytes"].iloc[i]
        if b is None:
            continue
        try:
            px = img.decode(bytes(b))
        except Exception:
            continue
        ref = img.make_pixels(str(pdf["image_id"].iloc[i]),
                              int(pdf["w"].iloc[i]), int(pdf["h"].iloc[i]))
        p = img.psnr(ref, px)
        psnr_db[i] = p if np.isfinite(p) else 1e9
        fmt = pdf["fmt"].iloc[i]
        pixel_ok[i] = bool(np.array_equal(ref, px) if fmt == "png"
                           else p >= V.PSNR_GATE_DB)
        ph = pdf["phash"].iloc[i]
        if not pd.isna(ph):
            dist = img.hamming64(img.phash64(px), int(ph))
            phash_ok[i] = (dist == 0 if fmt == "png"
                           else dist <= V.PHASH_LOSSY_HAMMING)
    return pd.DataFrame({"image_id": pdf["image_id"], "fmt": pdf["fmt"],
                         "psnr_db": psnr_db, "pixel_ok": pixel_ok,
                         "phash_ok": phash_ok, "caption_ok": caption_ok})


def test_verify_batch_matches_per_row_loop():
    """Mixed Arrow batch: multiple shapes, both formats, a corrupt payload,
    a NULL payload, a NULL phash, a caption mismatch, and a tampered image
    — the vectorized stage returns exactly the per-row loop's rows."""
    rows = []
    k = 0
    for w, h in [(64, 64), (32, 48), (6, 8)]:
        for fmt in ["png", "jpeg"]:
            for _ in range(5):
                iid = f"vb{k:04d}"
                k += 1
                p = img.build_payload(iid, w, h, fmt, caption=f"cap {iid}")
                p["expected_caption"] = f"cap {iid}"
                rows.append(p)
    rows[2]["bytes"] = b"garbage-not-an-image"          # decode failure
    rows[3]["bytes"] = None                             # missing payload
    rows[4]["phash"] = None                             # no carried phash
    rows[5]["expected_caption"] = "different"           # caption mismatch
    tam = bytearray(rows[6]["bytes"])                   # tampered pixels
    tam[-1] ^= 0xFF
    rows[6]["bytes"] = bytes(tam)
    pdf = pd.DataFrame(rows)
    pdf["phash"] = pd.array(pdf["phash"], dtype="Int64")

    want = _verify_rows_per_row(pdf)
    got = V._verify_batch(pdf, V._default_render, batch_render=True)
    got_rr = V._verify_batch(pdf, V._default_render, batch_render=False)

    for col in ["pixel_ok", "phash_ok", "caption_ok"]:
        assert got[col].tolist() == want[col].tolist(), col
        assert got_rr[col].tolist() == want[col].tolist(), col
    for g in (got, got_rr):
        same = (g["psnr_db"].to_numpy() == want["psnr_db"].to_numpy())
        both_nan = (np.isnan(g["psnr_db"].to_numpy())
                    & np.isnan(want["psnr_db"].to_numpy()))
        assert np.all(same | both_nan)
