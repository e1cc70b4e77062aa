"""Regenerate img_verify40.parquet — the DuckDB oracle side-table for
``img_verify_psnr`` (suite.py), the north-rule per-row payload invariant
(BASELINE.json input_hint: decoded-pixel allclose, PSNR >= 40 dB for lossy,
plus caption equality).

Driver-side, independent of engine/verify.py: for each of the 40 folded
image ids (doc_id % 40), build the deterministic payload, decode it, and
recompute PSNR / pixel_ok / phash_ok with inline math — the per-row
semantics the distributed mapInPandas verify stage must reproduce.

Run from the repo root:  python tests/fixtures/gen_img_verify40.py
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pttcrawler_spark.synth import images as img  # noqa: E402

N_IDS = 40
W = H = 32
PSNR_GATE_DB = 40.0
PHASH_LOSSY_HAMMING = 2


def _psnr(ref: np.ndarray, got: np.ndarray) -> float:
    mse = float(np.mean((ref.astype(np.float64) - got.astype(np.float64)) ** 2))
    if mse == 0.0:
        return 1e9  # lossless exact decode — matches verify.py's inf clamp
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def main() -> None:
    rows = []
    for i in range(N_IDS):
        iid = str(i)
        fmt = "jpeg" if img.seed_for(iid) % 3 == 0 else "png"
        payload = img.build_payload(iid, W, H, fmt, caption=f"caption {iid}")
        decoded = img.decode(payload["bytes"])
        ref = img.make_pixels(iid, W, H)
        p = _psnr(ref, decoded)
        pixel_ok = (bool(np.array_equal(ref, decoded)) if fmt == "png"
                    else p >= PSNR_GATE_DB)
        dist = bin(img.phash64(decoded) ^ int(payload["phash"])).count("1")
        phash_ok = dist == 0 if fmt == "png" else dist <= PHASH_LOSSY_HAMMING
        rows.append({
            # full-precision psnr: both the suite query and its oracle SQL
            # round with floor(x*100)/100 on the identical double, so no
            # HALF_UP-vs-banker's rounding skew can enter the value hash
            "image_id": iid,
            "fmt": fmt,
            "psnr_db": p,
            "pixel_ok": pixel_ok,
            "phash_ok": phash_ok,
        })
    out = pd.DataFrame(rows)
    path = os.path.join(os.path.dirname(__file__), "img_verify40.parquet")
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows; "
          f"pixel_ok={int(out.pixel_ok.sum())} phash_ok={int(out.phash_ok.sum())}")


if __name__ == "__main__":
    main()
