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
- build_videos_df / build_audio_df: deterministic av tables (synth/av codec).
- frame_sample: video → sampled stills (one row per sampled frame).
- audio_features: PCM → duration/RMS/peak. Both run the real mapInPandas
  pipeline over binary columns; only the codec itself is the deterministic
  synthetic one (no av libs in this container — synth/av.py).
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


# per-id dimension palette for the VARIED builder (seed_for(id) % len picks
# one): mixes portrait/square/landscape so aspect-dependent ops (bucketing,
# resize policies) are non-degenerate, and batch rows genuinely differ in
# byte length — the ragged-binary case a real crawl feeds the decoder
VARIED_DIMS = [(32, 32), (48, 32), (32, 48), (64, 32), (40, 56)]


def _spread(ids: DataFrame, id_col: str) -> DataFrame:
    """Cast the id column and spread rows across the cluster before the
    Python stage. The id source is typically a small dimension scan (1-2
    input splits), and mapInPandas parallelism = input partitions — without
    this, 32 cores run 1-2 Python workers (measured: img_verify_psnr 6.7 s
    → 1.3 s at sf0.1/local[32]). The shuffle moves only id strings."""
    out = ids.select(F.col(id_col).cast("string").alias(id_col))
    return out.repartition(out.sparkSession.sparkContext.defaultParallelism)


def build_images_df_varied(ids: DataFrame,
                           id_col: str = "image_id") -> DataFrame:
    """Like :func:`build_images_df` but each id gets seed-chosen dimensions
    from :data:`VARIED_DIMS` — variable-size payloads through the identical
    Arrow batch path."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col].astype(str):
                s = img.seed_for(i)
                w, h = VARIED_DIMS[s % len(VARIED_DIMS)]
                fmt = "jpeg" if s % 3 == 0 else "png"
                rows.append(img.build_payload(i, w, h, fmt,
                                              caption=f"caption {i}"))
            out = pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[c.split(" ")[0] for c in IMAGES_DDL.split(", ")])
            if len(rows):
                out["phash"] = pd.array([r["phash"] for r in rows], dtype="Int64")
            yield out

    return _spread(ids, id_col).mapInPandas(gen, schema=IMAGES_DDL)


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

    return _spread(ids, id_col).mapInPandas(gen, schema=IMAGES_DDL)


def build_images_with_crops(ids: DataFrame, id_col: str = "image_id",
                            crop_every: int = 4, w: int = 48, h: int = 48,
                            crop_w: int = 32, crop_h: int = 32) -> DataFrame:
    """Base image per id at (w,h) png, PLUS — for ids divisible by
    ``crop_every`` — a ``c<id>`` row whose pixels are the top-left
    (crop_w, crop_h) crop of the base. Lossless png keeps crop pixels
    byte-identical to the source region, so tile-level dedup
    (:func:`tile_phash`) must find them; full-image phash must NOT (the
    crop shifts every 8x8 block boundary relative to the source grid)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col].astype(str):
                px = img.make_pixels(i, w, h)
                rows.append({"image_id": i, "bytes": img.encode(px, "png"),
                             "w": w, "h": h, "fmt": "png",
                             "caption": f"caption {i}",
                             "phash": img.phash64(px)})
                if int(i) % crop_every == 0:
                    cpx = px[:crop_h, :crop_w]
                    rows.append({"image_id": f"c{i}",
                                 "bytes": img.encode(cpx, "png"),
                                 "w": crop_w, "h": crop_h, "fmt": "png",
                                 "caption": f"caption c{i}",
                                 "phash": img.phash64(cpx)})
            out = pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[c.split(" ")[0] for c in IMAGES_DDL.split(", ")])
            if len(rows):
                out["phash"] = pd.array([r["phash"] for r in rows], dtype="Int64")
            yield out

    return _spread(ids, id_col).mapInPandas(gen, schema=IMAGES_DDL)


TILE_DDL = "image_id string, tx int, ty int, tile_hash long"


def tile_phash(images: DataFrame, tile: int = 16) -> DataFrame:
    """Per-aligned-tile perceptual hash: decode, split into the (w//tile x
    h//tile) grid, phash each tile. The crop-resistant dedup key — a
    top-left-anchored crop reproduces the source's tile grid over the
    shared region, where full-image phash sees two unrelated images."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b in zip(pdf["image_id"].astype(str), pdf["bytes"]):
                px = img.decode(bytes(b))
                hh, ww = px.shape[:2]
                for ty in range(hh // tile):
                    for tx in range(ww // tile):
                        t = px[ty * tile:(ty + 1) * tile,
                               tx * tile:(tx + 1) * tile]
                        rows.append((iid, tx, ty, img.phash64(t)))
            out = pd.DataFrame(rows, columns=["image_id", "tx", "ty",
                                              "tile_hash"])
            out["tx"] = out["tx"].astype("int32") if len(rows) else out["tx"]
            out["ty"] = out["ty"].astype("int32") if len(rows) else out["ty"]
            if len(rows):
                out["tile_hash"] = pd.array(out["tile_hash"], dtype="Int64")
            yield out

    return images.select("image_id", "bytes").mapInPandas(run, schema=TILE_DDL)


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


# --- av decode paths (deterministic synthetic codec, synth/av.py) -----------
VIDEOS_DDL = ("video_id string, bytes binary, w int, h int, fps int, "
              "n_frames int")
AUDIO_IN_DDL = ("audio_id string, bytes binary, sample_rate int, "
                "duration_s double")


def build_videos_df(ids: DataFrame, id_col: str = "video_id",
                    w: int = 32, h: int = 32, n_frames: int = 12) -> DataFrame:
    """id column → deterministic video table (binary SVID payloads)."""
    from ..synth import av

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [av.build_video_payload(i, w, h, n_frames)
                    for i in pdf[id_col].astype(str)]
            yield (pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[c.split(" ")[0] for c in VIDEOS_DDL.split(", ")]))

    return _spread(ids, id_col).mapInPandas(gen, schema=VIDEOS_DDL)


def build_audio_df(ids: DataFrame, id_col: str = "audio_id",
                   sample_rate: int = 8000) -> DataFrame:
    """id column → deterministic audio table (binary SWAV payloads)."""
    from ..synth import av

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # per-id duration varies deterministically (1.0-2.0 s)
            rows = [av.build_audio_payload(
                        i, sample_rate,
                        seconds=1.0 + (img.seed_for(i) % 1000) / 1000.0)
                    for i in pdf[id_col].astype(str)]
            yield (pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[c.split(" ")[0] for c in AUDIO_IN_DDL.split(", ")]))

    return _spread(ids, id_col).mapInPandas(gen, schema=AUDIO_IN_DDL)


FRAME_DDL = "video_id string, frame_idx int, ts_ms long, bytes binary"


def frame_sample(videos: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: decode the container, emit one encoded still
    (lossless SPNG) every ``every_ms`` of media time — the canonical
    video→image fan-out stage of a multimodal pipeline. One input row yields
    ceil(duration/every_ms) output rows; mapInPandas streams Arrow batches so
    a long video never materializes per-row Python objects outside the batch
    loop. Swap ``synth.av.decode_video`` for a pyav binding to run on real
    media."""
    from ..synth import av

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "ts_ms": [], "bytes": []}
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                frames, fps = av.decode_video(bytes(data))
                step = max(int(round(every_ms * fps / 1000.0)), 1)
                for f in range(0, frames.shape[0], step):
                    out["video_id"].append(vid)
                    out["frame_idx"].append(f)
                    out["ts_ms"].append(int(f * 1000 / fps))
                    out["bytes"].append(img.encode(frames[f], "png"))
            yield pd.DataFrame({
                "video_id": pd.array(out["video_id"], dtype="string"),
                "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                "ts_ms": pd.array(out["ts_ms"], dtype="Int64"),
                "bytes": pd.Series(out["bytes"], dtype="object"),
            })

    return videos.select(F.col("video_id").cast("string"), "bytes") \
        .mapInPandas(run, schema=FRAME_DDL)


AUDIO_DDL = "audio_id string, duration_s double, rms double, peak double"


def audio_features(audio: DataFrame) -> DataFrame:
    """Audio feature extraction: decode PCM → duration, RMS and peak level
    (normalized to [-1, 1]) — numpy-vectorized per payload inside the Arrow
    batch loop. Swap ``synth.av.decode_audio`` for soundfile/ffmpeg to run on
    real media."""
    from ..synth import av

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, durs, rmss, peaks = [], [], [], []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                pcm, rate = av.decode_audio(bytes(data))
                x = pcm.astype(np.float64) / 32768.0
                ids.append(aid)
                durs.append(len(pcm) / rate)
                rmss.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                peaks.append(float(np.max(np.abs(x))) if len(x) else 0.0)
            yield pd.DataFrame({
                "audio_id": pd.array(ids, dtype="string"),
                "duration_s": pd.array(durs, dtype="float64"),
                "rms": pd.array(rmss, dtype="float64"),
                "peak": pd.array(peaks, dtype="float64"),
            })

    return audio.select(F.col("audio_id").cast("string"), "bytes") \
        .mapInPandas(run, schema=AUDIO_DDL)
