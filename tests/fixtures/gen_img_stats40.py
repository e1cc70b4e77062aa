"""Regenerate img_stats40.parquet — the DuckDB oracle side-table for
``img_decode_stats`` and ``img_resize_thumb`` (suite.py).

Driver-side, pure numpy (no Spark, no functions/image_ops import): for each
of the 40 folded image ids (doc_id % 40), build the deterministic payload,
DECODE the encoded bytes, and recompute channel stats plus the 8×8
nearest-neighbor thumbnail phash with independent inline math — the per-row
semantics the distributed mapInPandas stages must reproduce.

Run from the repo root:  python tests/fixtures/gen_img_stats40.py
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pttcrawler_spark.synth import images as img  # noqa: E402

N_IDS = 40
W = H = 32
TW = TH = 8


def _nn_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = px.shape[:2]
    yi = (np.arange(out_h) * (h / out_h)).astype(int).clip(0, h - 1)
    xi = (np.arange(out_w) * (w / out_w)).astype(int).clip(0, w - 1)
    return px[yi][:, xi]


def main() -> None:
    rows = []
    for i in range(N_IDS):
        iid = str(i)
        fmt = "jpeg" if img.seed_for(iid) % 3 == 0 else "png"
        decoded = img.decode(img.encode(img.make_pixels(iid, W, H), fmt))
        px = decoded.astype(np.float64)
        rows.append({
            "image_id": iid,
            "mean_r": round(float(px[:, :, 0].mean()), 4),
            "mean_g": round(float(px[:, :, 1].mean()), 4),
            "mean_b": round(float(px[:, :, 2].mean()), 4),
            "std_gray": round(float(px.mean(axis=2).std()), 4),
            "aspect": round(px.shape[1] / px.shape[0], 4),
            "thumb_phash": img.phash64(_nn_resize(decoded, TW, TH)),
        })
    out = pd.DataFrame(rows)
    out["thumb_phash"] = out["thumb_phash"].astype("int64")
    path = os.path.join(os.path.dirname(__file__), "img_stats40.parquet")
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows")


if __name__ == "__main__":
    main()
