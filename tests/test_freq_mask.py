"""SpecAugment frequency masking (freq_mask_frames): md5 plan replay
vs a python reference, per-clip plan consistency, NULL passthrough,
epoch-seed independence, logmel composition, guards."""

from __future__ import annotations

import hashlib

import pytest

from jepl_spark.functions.audio_udfs import freq_mask_frames


def h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def plan(clip_id, seed, n_masks, max_bins, n_dims):
    spans = []
    for k in range(n_masks):
        ln = 1 + h60(f"{seed}:{clip_id}:{k}:F") % max_bins
        st = h60(f"{seed}:{clip_id}:{k}:P") % max(1, n_dims - ln + 1)
        spans.append((st, ln))
    return spans


def test_plan_and_values_match_reference(spark):
    rows = [(f"c{i}", t, [float(i * 31 + t * 17 + d * 7) for d in range(10)])
            for i in range(5) for t in range(3)]
    rows.append((None, 0, [1.0] * 10))
    df = spark.createDataFrame(
        rows, "clip_id string, frame_idx int, feat array<double>")
    out = freq_mask_frames(df, n_masks=2, max_mel_bins=4, seed="ep0",
                           mask_value=-9.0).collect()
    plans = {}
    for r in out:
        if r["clip_id"] is None:
            assert r["feat"] == [1.0] * 10  # NULL id passes unmasked
            continue
        spans = plan(r["clip_id"], "ep0", 2, 4, 10)
        i = int(r["clip_id"][1:])
        exp = [(-9.0 if any(s <= d < s + ln for s, ln in spans) else
                float(i * 31 + r["frame_idx"] * 17 + d * 7))
               for d in range(10)]
        assert r["feat"] == exp
        got = [(m["start_bin"], m["len_bins"]) for m in r["freq_masks"]]
        assert got == spans
        # every frame of a clip shares one plan
        assert plans.setdefault(r["clip_id"], tuple(got)) == tuple(got)


def test_seed_draws_fresh_masks(spark):
    df = spark.createDataFrame(
        [(f"c{i}", [0.0] * 32) for i in range(40)],
        "clip_id string, feat array<double>")
    a = {r["clip_id"]: tuple((m["start_bin"], m["len_bins"])
                             for m in r["freq_masks"])
         for r in freq_mask_frames(df, seed="ep0").collect()}
    b = {r["clip_id"]: tuple((m["start_bin"], m["len_bins"])
                             for m in r["freq_masks"])
         for r in freq_mask_frames(df, seed="ep1").collect()}
    assert any(a[c] != b[c] for c in a)  # independent draws
    # re-run with the same seed is identical
    a2 = {r["clip_id"]: tuple((m["start_bin"], m["len_bins"])
                              for m in r["freq_masks"])
          for r in freq_mask_frames(df, seed="ep0").collect()}
    assert a == a2


def test_band_clips_at_vector_end(spark):
    # max_mel_bins > n_dims: start pins to 0, the band covers what
    # exists (time_mask's end-clip rule)
    df = spark.createDataFrame([("c", [5.0, 5.0])],
                               "clip_id string, feat array<double>")
    r = freq_mask_frames(df, n_masks=1, max_mel_bins=50,
                         mask_value=0.0).collect()[0]
    ln = 1 + h60("fmask:c:0:F") % 50
    if ln >= 2:
        assert r["freq_masks"][0]["start_bin"] == 0
        assert r["feat"] == [0.0, 0.0]


def test_composes_with_logmel(spark):
    from jepl_spark.functions.audio_udfs import logmel_clips
    from jepl_spark.sources.clips import clips_df

    frames = logmel_clips(
        clips_df(spark, 4).select("clip_id", "bytes", "codec", "sr_hz"),
        n_mels=16, cmvn=True)
    out = freq_mask_frames(frames, n_masks=2, max_mel_bins=4).collect()
    assert out
    for r in out[:20]:
        spans = plan(r["clip_id"], "fmask", 2, 4, 16)
        for s, ln in spans:
            assert all(v == 0.0 for v in r["feat"][s:s + ln])


def test_guards(spark):
    df = spark.createDataFrame([("c", [1.0])],
                               "clip_id string, feat array<double>")
    with pytest.raises(ValueError, match="needs column"):
        freq_mask_frames(df, feat_col="nope")
    with pytest.raises(ValueError, match="n_masks"):
        freq_mask_frames(df, n_masks=0)
    with pytest.raises(ValueError, match="overwrite"):
        freq_mask_frames(freq_mask_frames(df))
