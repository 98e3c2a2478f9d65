"""Multimodal (image / video-frame) lane tests: real plumbing around a
deterministic fake codec (brief mandate — no image libraries in this
container, so the codec boundary raises for real formats and the
in-repo RAWv1 format exercises every stage end-to-end)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jepl_spark.functions import multimodal as M


def test_raw_codec_roundtrip():
    px = M._synth_pixels(42, 48, 24, 3)
    assert px.shape == (24, 48, 3) and px.dtype == np.uint8
    assert np.array_equal(M.decode_raw(M.encode_raw(px)), px)


def test_images_decode_stats_matches_numpy(spark):
    df = M.images_df(spark, 20)
    stats = {r["img_id"]: r for r in M.decode_image_stats(df).collect()}
    assert len(stats) == 20
    for img_id in (0, 7, 13):
        w = 32 + img_id % 5 * 16
        h = 24 + img_id % 3 * 24
        px = M._synth_pixels(img_id, w, h, 3).astype(np.float64)
        r = stats[img_id]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r"] == pytest.approx(px[:, :, 0].mean())
        assert r["mean_g"] == pytest.approx(px[:, :, 1].mean())
        assert r["std_all"] == pytest.approx(px.std())


def test_resize_shape_and_determinism(spark):
    df = M.images_df(spark, 6)
    resized = M.resize_images(df, 16, 12)
    rows = {r["img_id"]: r for r in resized.collect()}
    assert all((r["width"], r["height"]) == (16, 12) for r in rows.values())
    px = M.decode_raw(rows[3]["bytes"])
    assert px.shape == (12, 16, 3)
    # nearest-neighbor reference in numpy
    w = 32 + 3 % 5 * 16
    h = 24 + 3 % 3 * 24
    src = M._synth_pixels(3, w, h, 3)
    ys = (np.arange(12) * h // 12).clip(0, h - 1)
    xs = (np.arange(16) * w // 16).clip(0, w - 1)
    assert np.array_equal(px, src[ys][:, xs])


def test_real_codec_formats_raise(spark):
    # webp genuinely needs an external library (png/jpeg decode in-repo)
    df = M.images_df(spark, 2).withColumn("fmt", F.lit("webp"))
    with pytest.raises(Exception, match="codec library"):
        M.decode_image_stats(df).collect()


def test_frame_sampling_is_jvm_side(spark):
    df = M.frames_df(spark, n_videos=3, frames_per_video=10)
    sampled = M.sample_frames(df, every_n=4)
    got = sorted(
        (r["video_id"], r["frame_idx"])
        for r in sampled.select("video_id", "frame_idx").collect()
    )
    assert got == [(v, f) for v in range(3) for f in (0, 4, 8)]
    # the filter must be a plain JVM predicate, not Python
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # sampled frames still decode
    one = sampled.limit(1).collect()[0]
    assert M.decode_raw(one["bytes"]).shape == (24, 32, 3)


def test_dhash_resize_robustness_and_hamming_search(spark):
    """dHash survives nearest-neighbor resizing (the property that
    makes it a perceptual hash, not a checksum): each image's resized
    variant stays within a small Hamming radius of the original, and
    the banded Hamming search (shared with SimHash) finds exactly the
    original↔resized pairs at that radius."""
    from pyspark.sql import functions as F

    from jepl_spark.functions.multimodal import (
        image_dhash,
        images_df,
        resize_images,
    )
    from jepl_spark.operators.dedup import simhash_hamming_near_dups

    imgs = images_df(spark, 24, partitions=4)
    orig = image_dhash(imgs).withColumnRenamed("dhash", "h_orig")
    rs = image_dhash(resize_images(imgs, 48, 40)).withColumnRenamed(
        "dhash", "h_rs"
    )
    joined = orig.select("img_id", "h_orig").join(
        rs.select("img_id", "h_rs"), "img_id"
    )
    dist = joined.select(
        "img_id",
        F.bit_count(F.col("h_orig").bitwiseXOR(F.col("h_rs"))).alias("d"),
    ).collect()
    assert all(r["d"] <= 10 for r in dist), sorted(
        (r["img_id"], r["d"]) for r in dist
    )
    # composition: the banded Hamming searcher finds each orig↔resized
    # pair (ids offset by 1000 to keep them distinct rows)
    sigs = orig.selectExpr("img_id AS doc_id", "h_orig AS simhash").unionByName(
        rs.selectExpr("img_id + 1000 AS doc_id", "h_rs AS simhash")
    )
    pairs = simhash_hamming_near_dups(
        sigs, max_hamming=10, bands=16, sig=F.col("simhash")
    ).collect()
    want = {(i, i + 1000) for i in range(24)}
    got = {(min(p["id_a"], p["id_b"]), max(p["id_a"], p["id_b"]))
           for p in pairs}
    assert want <= got, want - got


def test_scene_changes_exact_boundaries(spark):
    """Every scene boundary found, zero false positives on the static
    shots, and the detector is partitioning-invariant."""
    from jepl_spark.functions.multimodal import scene_changes, scene_frames_df

    frames = scene_frames_df(spark, 4, 50, scene_len=10, partitions=6)
    got = sorted(
        (r["video_id"], r["frame_idx"])
        for r in scene_changes(frames, min_hamming=16).collect()
    )
    want = sorted((v, f) for v in range(4) for f in (10, 20, 30, 40))
    assert got == want
