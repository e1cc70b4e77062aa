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


def test_av_stubs_raise(spark):
    vids = spark.createDataFrame([("v1", b"\x00\x01")], "video_id string, bytes binary")
    with pytest.raises(Exception) as ei:
        IMG.frame_sample(vids).collect()
    assert "NotImplementedError" in str(ei.value) or "av library" in str(ei.value)
    auds = spark.createDataFrame([("a1", b"\x00\x01")], "audio_id string, bytes binary")
    with pytest.raises(Exception) as ei2:
        IMG.audio_features(auds).collect()
    assert "NotImplementedError" in str(ei2.value) or "audio library" in str(ei2.value)
