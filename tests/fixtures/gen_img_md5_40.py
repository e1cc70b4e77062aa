"""Regenerate img_md5_40.parquet — the DuckDB oracle side-table for
``img_dedup_bytes`` (suite.py).

Driver-side, pure Python (no Spark): for each of the 40 folded image ids
(doc_id % 40), build the deterministic encoded payload exactly as the
executor-side ``functions/image_ops.build_images_df`` does (32×32, fmt
alternating on seed), and record md5 over the encoded bytes — the value the
distributed ``F.md5(bytes)`` column must reproduce.

Run from the repo root:  python tests/fixtures/gen_img_md5_40.py
"""

import hashlib
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
        enc = img.encode(img.make_pixels(iid, W, H), fmt)
        rows.append({"image_id": iid,
                     "bytes_md5": hashlib.md5(enc).hexdigest()})
    out = pd.DataFrame(rows)
    path = os.path.join(os.path.dirname(__file__), "img_md5_40.parquet")
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows")


if __name__ == "__main__":
    main()
