"""Multimodal (image) column operators — the training-data-pipeline surface.

Images are opaque ``binary`` columns with typed metadata
(image_id, bytes, w, h, fmt, caption, phash — BASELINE.json input_hint).
All ops are Arrow-batched (mapInPandas / pandas UDF); the per-row loop lives
inside a batch function, exactly the shape a real codec binding (PIL/opencv/
ffmpeg) would have. The codec itself is the deterministic synthetic one from
``synth.images`` (the container ships no image libraries); swapping in a real
codec changes only that module.

Ops:
- build_images_df: deterministic image table derived from any id column —
  how tests/benches synthesize an input_hint-shaped table from the driver's
  ``documents`` parquet without external data.
- decode_stats: decode → per-channel mean/std + aspect ratio (the "feature
  extract" stage of a multimodal pipeline).
- resize: nearest-neighbor resize (thumbnailing) → re-encoded bytes.
- phash_col: perceptual hash of the DECODED pixels (dedup key).
- frame_sample / audio_features: video/audio stubs — the container has no
  av libs; the Spark plumbing (schema, batch shape) is real, the decode
  raises NotImplementedError per the build contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..synth import images as img

IMAGES_DDL = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")


def build_images_df(ids: DataFrame, id_col: str = "image_id",
                    w: int = 32, h: int = 32) -> DataFrame:
    """id column → deterministic input_hint-shaped image table.

    Pure function of the id (fmt alternates png/jpeg on id hash), so any
    slice regenerates reproducibly on any executor — the same property the
    synthetic site corpus has (synth/site.py).
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col].astype(str):
                fmt = "jpeg" if img.seed_for(i) % 3 == 0 else "png"
                rows.append(img.build_payload(i, w, h, fmt, caption=f"caption {i}"))
            out = pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[c.split(" ")[0] for c in IMAGES_DDL.split(", ")])
            if len(rows):
                out["phash"] = pd.array([r["phash"] for r in rows], dtype="Int64")
            yield out

    return ids.select(F.col(id_col).cast("string").alias(id_col)) \
        .mapInPandas(gen, schema=IMAGES_DDL)


DECODE_STATS_DDL = ("image_id string, mean_r double, mean_g double, "
                    "mean_b double, std_gray double, aspect double, "
                    "decode_ok boolean")


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode + channel statistics — the feature-extraction stage."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px = img.decode(bytes(b)).astype(np.float64)
                    rows.append({
                        "image_id": iid,
                        "mean_r": round(float(px[:, :, 0].mean()), 4),
                        "mean_g": round(float(px[:, :, 1].mean()), 4),
                        "mean_b": round(float(px[:, :, 2].mean()), 4),
                        "std_gray": round(float(px.mean(axis=2).std()), 4),
                        "aspect": round(px.shape[1] / px.shape[0], 4),
                        "decode_ok": True,
                    })
                except Exception:
                    rows.append({"image_id": iid, "mean_r": None, "mean_g": None,
                                 "mean_b": None, "std_gray": None, "aspect": None,
                                 "decode_ok": False})
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes").mapInPandas(run, schema=DECODE_STATS_DDL)


def resize_nn(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (no scipy/PIL in the container)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * (h / out_h)).astype(int).clip(0, h - 1)
    xi = (np.arange(out_w) * (w / out_w)).astype(int).clip(0, w - 1)
    return pixels[yi][:, xi]


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Thumbnail stage: decode → NN-resize → re-encode lossless."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b in zip(pdf["image_id"], pdf["bytes"]):
                px = resize_nn(img.decode(bytes(b)), out_w, out_h)
                rows.append({"image_id": iid, "bytes": img.encode(px, "png"),
                             "w": out_w, "h": out_h, "fmt": "png",
                             "thumb_phash": img.phash64(px)})
            out = pd.DataFrame(rows)
            if len(rows):
                out["thumb_phash"] = pd.array(
                    [r["thumb_phash"] for r in rows], dtype="Int64")
            yield out

    ddl = "image_id string, bytes binary, w int, h int, fmt string, thumb_phash long"
    return images.select("image_id", "bytes").mapInPandas(run, schema=ddl)


def phash_col(images: DataFrame) -> DataFrame:
    """Recompute the perceptual hash from DECODED pixels (dedup key)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "image_id": pdf["image_id"],
                "phash64": pd.array(
                    [img.phash64(img.decode(bytes(b))) for b in pdf["bytes"]],
                    dtype="Int64"),
            })
            yield out

    return images.select("image_id", "bytes").mapInPandas(
        run, schema="image_id string, phash64 long")


# --- stubs: av decode paths (no libs in this container) ---------------------
FRAME_DDL = "video_id string, frame_idx int, ts_ms long, bytes binary"


def frame_sample(videos: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — Spark plumbing is real (schema/batch shape),
    the codec is stubbed: ffmpeg/pyav are not in this container."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "video decode requires an av library (ffmpeg/pyav); "
                "not available in this environment")
        yield pd.DataFrame()  # pragma: no cover

    return videos.select(F.col("video_id").cast("string"), "bytes") \
        .mapInPandas(run, schema=FRAME_DDL)


AUDIO_DDL = "audio_id string, duration_s double, rms double"


def audio_features(audio: DataFrame) -> DataFrame:
    """Audio feature extraction — stubbed like frame_sample."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "audio decode requires an audio library; "
                "not available in this environment")
        yield pd.DataFrame()  # pragma: no cover

    return audio.select(F.col("audio_id").cast("string"), "bytes") \
        .mapInPandas(run, schema=AUDIO_DDL)
