"""Regression delta features (add_deltas): parity with a brute-force
HTK/Kaldi reference (edge replication, K=2), single-frame clips,
composition over logmel_clips output, and guards."""

from __future__ import annotations

import numpy as np
import pytest

from jepl_spark.operators.similarity import add_deltas


def htk_deltas(m, K=2):
    T = m.shape[0]
    denom = 2 * sum(k * k for k in range(1, K + 1))
    d = np.zeros_like(m)
    for t in range(T):
        for k in range(1, K + 1):
            d[t] += k * (m[min(t + k, T - 1)] - m[max(t - k, 0)])
    return d / denom


def test_matches_htk_reference(spark):
    rng = np.random.default_rng(5)
    rows, mats = [], {}
    for clip in range(8):
        T = int(rng.integers(1, 14))  # includes T=1 (all-clamped)
        m = rng.standard_normal((T, 5)).round(3)
        mats[f"c{clip}"] = m
        for t in range(T):
            rows.append((f"c{clip}", t, [float(v) for v in m[t]]))
    df = spark.createDataFrame(
        rows, "clip_id string, frame_idx int, feat array<double>"
    )
    out = add_deltas(df)
    assert {"delta", "delta2"} <= set(out.columns)
    for r in out.collect():
        m = mats[r["clip_id"]]
        d1 = htk_deltas(m)
        np.testing.assert_allclose(
            r["delta"], d1[r["frame_idx"]], rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            r["delta2"], htk_deltas(d1)[r["frame_idx"]],
            rtol=1e-9, atol=1e-12,
        )


def test_single_frame_clip_is_zero():
    # T=1: every neighbor clamps to the frame itself -> deltas 0
    m = np.array([[1.0, -2.0, 3.0]])
    assert np.all(htk_deltas(m) == 0.0)  # reference sanity


def test_order_one_only(spark):
    df = spark.createDataFrame(
        [("c", t, [float(t)]) for t in range(6)],
        "clip_id string, frame_idx int, feat array<double>",
    )
    out = add_deltas(df, order=1)
    assert "delta" in out.columns and "delta2" not in out.columns
    # linear ramp: interior delta = exactly 1.0 (the regression is
    # exact on affine sequences)
    rows = {r["frame_idx"]: r["delta"][0] for r in out.collect()}
    assert rows[2] == pytest.approx(1.0) and rows[3] == pytest.approx(1.0)


def test_composes_with_logmel(spark):
    from jepl_spark.functions.audio_udfs import logmel_clips
    from jepl_spark.sources.clips import clips_df

    frames = logmel_clips(
        clips_df(spark, 6).select("clip_id", "bytes", "codec", "sr_hz"),
        n_mels=8,
    )
    out = add_deltas(frames)
    rows = out.where(out.clip_id == "clip-000000000000").orderBy(
        "frame_idx"
    ).collect()
    assert rows
    m = np.array([r["feat"] for r in rows], dtype=np.float64)
    d1 = htk_deltas(m)
    for r in rows[:3] + rows[-3:]:
        np.testing.assert_allclose(
            r["delta"], d1[r["frame_idx"]], rtol=1e-5, atol=1e-6
        )


def test_guards(spark):
    df = spark.createDataFrame(
        [("c", 0, [1.0])], "clip_id string, frame_idx int, feat array<double>"
    )
    with pytest.raises(ValueError, match="needs column"):
        add_deltas(df, feat_col="nope")
    with pytest.raises(ValueError, match="order"):
        add_deltas(df, order=3)
