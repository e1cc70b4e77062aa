"""Regenerate img_aspect40.parquet — the DuckDB oracle side-table for
``img_aspect_bucket`` (suite.py).

Driver-side, pure numpy: for each of the 40 folded image ids, pick the
seed-chosen dimensions exactly as ``functions/image_ops.build_images_df_varied``
does, DECODE the encoded bytes, and recompute the decoded aspect ratio plus
its training-batch bucket with independent inline math.

Run from the repo root:  python tests/fixtures/gen_img_aspect40.py
"""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pttcrawler_spark.functions.image_ops import VARIED_DIMS  # noqa: E402
from pttcrawler_spark.synth import images as img  # noqa: E402

N_IDS = 40


def bucket_of(aspect: float) -> str:
    if aspect < 0.8:
        return "portrait"
    if aspect <= 1.25:
        return "square"
    if aspect <= 1.75:
        return "landscape"
    return "wide"


def main() -> None:
    rows = []
    for i in range(N_IDS):
        iid = str(i)
        s = img.seed_for(iid)
        w, h = VARIED_DIMS[s % len(VARIED_DIMS)]
        fmt = "jpeg" if s % 3 == 0 else "png"
        decoded = img.decode(img.encode(img.make_pixels(iid, w, h), fmt))
        aspect = round(decoded.shape[1] / decoded.shape[0], 4)
        rows.append({"image_id": iid, "aspect": aspect,
                     "bucket": bucket_of(aspect)})
    out = pd.DataFrame(rows)
    path = os.path.join(os.path.dirname(__file__), "img_aspect40.parquet")
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows; buckets:",
          out.bucket.value_counts().to_dict())


if __name__ == "__main__":
    main()
