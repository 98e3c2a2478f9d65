"""Per-frame log-mel filterbank tests: numpy-core value pinning (pure
tone lands in the closed-form mel bin, cross-rate bin alignment under a
pinned fmax), Spark parity with the numpy core, frame-count formula,
inline-CMVN equivalence with standardize_vectors, and the guard rails."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jepl_spark.functions.audio_udfs import (
    _next_pow2,
    logmel_clips,
    logmel_frames,
    mel_filterbank,
)
from jepl_spark.sources import audio


def tone(freq, sr, dur_ms):
    t = np.arange(int(sr * dur_ms / 1000), dtype=np.float64) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def expected_bin(freq, sr, n_mels, fmin, fmax, win_ms=25):
    """Closed-form: the mel filter with max response at the tone's rfft
    bin."""
    n_fft = _next_pow2(sr * win_ms // 1000)
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    k = int(round(freq * n_fft / sr))
    return int(np.argmax(fb[:, k]))


def test_pure_tone_lands_in_closed_form_bin():
    for sr, freq in ((8000, 500), (8000, 1800), (16000, 3000), (44100, 900)):
        m = logmel_frames(tone(freq, sr, 400), sr, 40, 25, 10, 0.0, sr / 2.0)
        assert m.shape[1] == 40 and m.shape[0] > 0
        want = expected_bin(freq, sr, 40, 0.0, sr / 2.0)
        got = int(np.argmax(np.median(m, axis=0)))
        assert abs(got - want) <= 1, (sr, freq, got, want)


def test_cross_rate_bin_alignment_with_pinned_fmax():
    """The point of the Hz-placed (not bin-placed) filterbank: the same
    1 kHz tone peaks in the SAME mel bin at 8 kHz and 16 kHz once fmax
    is pinned."""
    peaks = []
    for sr in (8000, 16000):
        m = logmel_frames(tone(1000, sr, 400), sr, 20, 25, 10, 0.0, 4000.0)
        peaks.append(int(np.argmax(np.median(m, axis=0))))
    assert peaks[0] == peaks[1], peaks


def test_frame_count_formula_and_short_clip():
    sr = 16000
    for dur_ms in (24, 25, 26, 200, 1234):
        x = tone(440, sr, dur_ms)
        m = logmel_frames(x, sr, 8, 25, 10, 0.0, sr / 2.0)
        win_n, hop_n = sr * 25 // 1000, sr * 10 // 1000
        exp = 0 if x.size < win_n else 1 + (x.size - win_n) // hop_n
        assert m.shape[0] == exp, (dur_ms, m.shape[0], exp)


def test_filterbank_partition_of_unity_interior():
    """Triangular HTK filters sum to ~1 between the first and last
    filter centers (the standard fbank sanity check)."""
    sr, n_fft, n_mels = 16000, 512, 40
    fb = mel_filterbank(sr, n_fft, n_mels, 0.0, sr / 2.0)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    colsum = fb.sum(axis=0)
    interior = (freqs > 300) & (freqs < 7000)
    assert np.all(colsum[interior] > 0.49) and np.all(colsum[interior] < 1.01)


def _clips(spark, n=24):
    from jepl_spark.sources.clips import clips_df

    return clips_df(spark, n).select("clip_id", "bytes", "codec", "sr_hz")


def test_spark_matches_numpy_core(spark):
    rows = logmel_clips(_clips(spark), n_mels=12).collect()
    assert rows
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["clip_id"], {})[r["frame_idx"]] = r
    from jepl_spark.sources.clips import clip_row

    for i in (0, 1, 2, 7, 19):
        src = clip_row(i)
        x = audio.decode(src["bytes"], src["codec"])
        sr = src["sr_hz"]
        m = logmel_frames(x, sr, 12, 25, 10, 0.0, sr / 2.0)
        got = by_clip[src["clip_id"]]
        assert len(got) == m.shape[0]
        assert sorted(got) == list(range(m.shape[0]))  # contiguous idx
        for fi in (0, m.shape[0] - 1):
            np.testing.assert_allclose(
                np.asarray(got[fi]["feat"], dtype=np.float64),
                m[fi],
                rtol=1e-6, atol=1e-6,
            )
            assert got[fi]["sr_hz"] == sr


def test_inline_cmvn_matches_standardize_vectors(spark):
    from jepl_spark.operators.similarity import standardize_vectors

    base = logmel_clips(_clips(spark, 12), n_mels=8)
    inline = logmel_clips(_clips(spark, 12), n_mels=8, cmvn=True)
    generic = standardize_vectors(base, vec_col="feat", group_by="clip_id")
    key = ["clip_id", "frame_idx"]
    a = {tuple(r[k] for k in key): r["feat"] for r in inline.collect()}
    b = {tuple(r[k] for k in key): r["feat_norm"] for r in generic.collect()}
    assert set(a) == set(b) and a
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], dtype=np.float64),
            np.asarray(b[k], dtype=np.float64),
            rtol=2e-4, atol=2e-4,  # float32 emission vs double pipeline
        )


def test_guards(spark):
    clips = _clips(spark, 3)
    with pytest.raises(ValueError, match="needs column"):
        logmel_clips(clips.drop("sr_hz"))
    with pytest.raises(ValueError, match="hop_ms"):
        logmel_clips(clips, hop_ms=30, win_ms=25)
    with pytest.raises(Exception, match="Nyquist"):
        # clips include 8 kHz rows; fmax 6 kHz exceeds their Nyquist
        logmel_clips(clips, fmax=6000.0).collect()
