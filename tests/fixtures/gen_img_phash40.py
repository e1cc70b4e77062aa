"""Regenerate img_phash40.parquet — the DuckDB oracle side-table for
``img_phash_dedup`` (suite.py).

Driver-side, pure numpy (no Spark): for each of the 40 folded image ids the
suite query uses (doc_id % 40), build the deterministic payload, DECODE the
encoded bytes, and recompute the perceptual hash — exactly the per-row
semantics the distributed mapInPandas path must reproduce. The oracle then
checks the distributed decode + groupBy against this independent computation.

Run from the repo root:  python tests/fixtures/gen_img_phash40.py
"""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pttcrawler_spark.synth import images as img  # noqa: E402

N_IDS = 40
W = H = 32


def main() -> None:
    rows = []
    for i in range(N_IDS):
        iid = str(i)
        fmt = "jpeg" if img.seed_for(iid) % 3 == 0 else "png"
        px = img.make_pixels(iid, W, H)
        decoded = img.decode(img.encode(px, fmt))
        rows.append({"image_id": iid, "phash64": img.phash64(decoded)})
    out = pd.DataFrame(rows)
    out["phash64"] = out["phash64"].astype("int64")
    path = os.path.join(os.path.dirname(__file__), "img_phash40.parquet")
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows")


if __name__ == "__main__":
    main()
