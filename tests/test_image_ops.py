"""Multimodal image operator tests (functions/image_ops.py) — the rows-only
suite entries' invariants: deterministic build, decode features, resize,
phash dedup, and the stubbed av paths."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pttcrawler_spark.functions import image_ops as IMG
from pttcrawler_spark.synth import images as I


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 40).select(F.col("id").cast("string").alias("image_id"))


@pytest.fixture(scope="module")
def images(spark, ids):
    return IMG.build_images_df(ids, w=32, h=32).cache()


def test_build_images_deterministic(spark, ids, images):
    a = images.toPandas().set_index("image_id").sort_index()
    b = IMG.build_images_df(ids, w=32, h=32).toPandas().set_index("image_id").sort_index()
    assert (a["phash"] == b["phash"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["bytes"], b["bytes"]))
    # phash column survives Arrow exactly (no float64 rounding)
    row = a.iloc[0]
    assert int(row["phash"]) == I.phash64(I.decode(bytes(row["bytes"]))) or \
        row["fmt"] == "jpeg"
    # both codec paths exercised
    assert set(a["fmt"]) == {"png", "jpeg"}


def test_decode_stats(images):
    st = IMG.decode_stats(images).toPandas().set_index("image_id")
    assert st["decode_ok"].all()
    assert ((st["mean_r"] >= 0) & (st["mean_r"] <= 255)).all()
    assert (st["aspect"] == 1.0).all()
    assert (st["std_gray"] > 0).all()
    # matches a driver-side recompute for one row
    pdf = images.where(F.col("image_id") == "0").toPandas().iloc[0]
    px = I.decode(bytes(pdf["bytes"])).astype(np.float64)
    assert abs(st.loc["0", "mean_r"] - round(float(px[:, :, 0].mean()), 4)) < 1e-9


def test_decode_stats_bad_bytes(spark):
    df = spark.createDataFrame([("bad", b"not an image")],
                               "image_id string, bytes binary")
    st = IMG.decode_stats(df).toPandas()
    assert len(st) == 1 and not st["decode_ok"].iloc[0]
    assert st["mean_r"].isna().all()


def test_resize_thumbnail(images):
    th = IMG.resize(images, 8, 8).toPandas().set_index("image_id")
    assert (th["w"] == 8).all() and (th["h"] == 8).all()
    px = I.decode(bytes(th.iloc[0]["bytes"]))
    assert px.shape == (8, 8, 3)
    # NN-resize agrees with the driver-side reference implementation
    src = images.where(F.col("image_id") == th.index[0]).toPandas().iloc[0]
    ref = IMG.resize_nn(I.decode(bytes(src["bytes"])), 8, 8)
    assert np.array_equal(px, ref)


def test_phash_matches_codec(images):
    ph = IMG.phash_col(images).toPandas().set_index("image_id")
    pdf = images.toPandas().set_index("image_id")
    for iid in list(pdf.index)[:5]:
        expect = I.phash64(I.decode(bytes(pdf.loc[iid, "bytes"])))
        assert int(ph.loc[iid, "phash64"]) == expect


def test_phash_dedup_groups(spark):
    # two ids per payload id → every phash appears exactly twice
    ids = spark.range(0, 20).select(
        F.pmod(F.col("id"), F.lit(10)).cast("string").alias("image_id"))
    imgs = IMG.build_images_df(ids)
    groups = (IMG.phash_col(imgs).groupBy("phash64")
              .agg(F.count("*").alias("n")).toPandas())
    assert len(groups) == 10 and (groups["n"] == 2).all()


def test_frame_sample_golden(spark):
    """Spark frame_sample matches a driver-side decode of the same payloads:
    frame indices step by round(every_ms*fps/1000), timestamps are media
    time, and each emitted still decodes back to the source frame."""
    from pttcrawler_spark.synth import av, images as img

    ids = spark.createDataFrame([("v0",), ("v1",), ("v2",)],
                                "video_id string")
    vids = IMG.build_videos_df(ids, n_frames=12)  # fps=10 → 1200 ms media
    out = IMG.frame_sample(vids, every_ms=500).toPandas()

    # fps=10, every_ms=500 → step 5 → frames 0,5,10 per video
    for vid in ("v0", "v1", "v2"):
        rows = out[out.video_id == vid].sort_values("frame_idx")
        assert rows.frame_idx.tolist() == [0, 5, 10]
        assert rows.ts_ms.tolist() == [0, 500, 1000]
        frames = av.make_frames(vid, n_frames=12)
        for _, r in rows.iterrows():
            assert (img.decode(bytes(r["bytes"])) ==
                    frames[r["frame_idx"]]).all()


def test_audio_features_golden(spark):
    """Spark audio_features matches numpy features computed driver-side."""
    import numpy as np

    from pttcrawler_spark.synth import av

    ids = spark.createDataFrame([("a0",), ("a1",), ("a2",), ("a3",)],
                                "audio_id string")
    out = IMG.audio_features(IMG.build_audio_df(ids)).toPandas() \
        .set_index("audio_id")
    from pttcrawler_spark.synth.images import seed_for
    for aid in ("a0", "a1", "a2", "a3"):
        pcm = av.make_waveform(aid, 8000,
                               seconds=1.0 + (seed_for(aid) % 1000) / 1000.0)
        x = pcm.astype(np.float64) / 32768.0
        r = out.loc[aid]
        assert abs(r["duration_s"] - len(pcm) / 8000) < 1e-9
        assert abs(r["rms"] - float(np.sqrt(np.mean(x * x)))) < 1e-12
        assert abs(r["peak"] - float(np.max(np.abs(x)))) < 1e-12
    # sanity: a pure sine + small noise has RMS in a plausible band
    assert 0.2 < out["rms"].min() and out["rms"].max() < 0.8


def test_video_codec_roundtrip():
    from pttcrawler_spark.synth import av

    frames = av.make_frames("vx", 16, 16, 5)
    dec, fps = av.decode_video(av.encode_video(frames, fps=10))
    assert fps == 10 and (dec == frames).all()
    pcm = av.make_waveform("ax")
    dec2, rate = av.decode_audio(av.encode_audio(pcm))
    assert rate == 8000 and (dec2 == pcm).all()


def test_fast_paths_bit_identical_to_reference_loops():
    """The round-4 perf rewrites of make_pixels (repeat×repeat for kron)
    and phash64 (packbits for the shift-or loop) must be BIT-identical —
    every committed phash / payload byte depends on them."""
    rng_ids = [f"img-{i}" for i in range(1000)] + [f"b{i}/p{i % 7}" for i in range(500)]
    sizes = [(32, 32), (8, 8), (48, 32), (7, 5), (64, 64)]
    checked = 0
    for n, iid in enumerate(rng_ids):
        w, h = sizes[n % len(sizes)]
        px = I.make_pixels(iid, w, h)
        # reference make_pixels: np.kron low-frequency overlay
        rng = np.random.default_rng(I.seed_for(iid))
        base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blocks = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        low = np.kron(blocks, np.ones((max(h // 8, 1), max(w // 8, 1)),
                                      dtype=np.uint8))[:h, :w]
        ref = ((base.astype(np.uint16) + low[:, :, None].astype(np.uint16)) // 2
               ).astype(np.uint8)
        assert np.array_equal(px, ref), iid
        # reference phash64: shift-or bit loop (with the same tiny-image
        # edge pad — the pre-rewrite code CRASHED below 8px, so the pad is
        # new behavior shared by both paths, not a fast-path divergence)
        gray = px.mean(axis=2)
        gh, gw = gray.shape
        if gh < 8 or gw < 8:
            gray = np.pad(gray, ((0, max(8 - gh, 0)), (0, max(8 - gw, 0))),
                          mode="edge")
            gh, gw = gray.shape
        bh, bw = max(gh // 8, 1), max(gw // 8, 1)
        bl = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
        bits = (bl > bl.mean()).flatten()
        val = 0
        for b in bits:
            val = (val << 1) | int(b)
        expect = int(np.int64(np.uint64(val)))
        assert I.phash64(px) == expect, iid
        checked += 2
    assert checked == 3000
