"""Regenerate img_tiles40.parquet — the DuckDB oracle side-table for
``img_crop_dup`` (suite.py).

Driver-side, pure numpy (no Spark): the 40 folded base images at 48x48 png
plus the top-left 32x32 crop of every 4th one (ids ``c0, c4, ...``), split
into the aligned 16px tile grid with a perceptual hash per tile — exactly
what the distributed build_images_with_crops -> tile_phash path recomputes
from encoded bytes. ``base_id`` carries the underlying source id so the
oracle can restrict to the ids present in the documents table at any sf.

Run from the repo root:  python tests/fixtures/gen_img_tiles40.py
"""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pttcrawler_spark.synth import images as img  # noqa: E402

N_IDS = 40
W = H = 48
CROP = 32
TILE = 16


def tiles_of(image_id: str, base_id: str, px) -> list[dict]:
    rows = []
    hh, ww = px.shape[:2]
    for ty in range(hh // TILE):
        for tx in range(ww // TILE):
            t = px[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE]
            rows.append({"image_id": image_id, "base_id": base_id,
                         "tx": tx, "ty": ty, "tile_hash": img.phash64(t)})
    return rows


def main() -> None:
    rows = []
    for i in range(N_IDS):
        iid = str(i)
        px = img.decode(img.encode(img.make_pixels(iid, W, H), "png"))
        rows += tiles_of(iid, iid, px)
        if i % 4 == 0:
            cpx = img.decode(img.encode(px[:CROP, :CROP], "png"))
            rows += tiles_of(f"c{iid}", iid, cpx)
    out = pd.DataFrame(rows)
    out["tile_hash"] = out["tile_hash"].astype("int64")
    path = os.path.join(os.path.dirname(__file__), "img_tiles40.parquet")
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows")


if __name__ == "__main__":
    main()
