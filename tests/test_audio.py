"""Audio lane: codec roundtrip invariants (decoded-PCM allclose at
SNR ≥ 30 dB + exact transcript equality vs the reference synthesis,
per BASELINE.json input_hint) — exercised end-to-end through Spark
(mapInPandas generation → Arrow pandas-UDF decode)."""

from __future__ import annotations

import numpy as np
import pytest

from jepl_spark.functions.audio_udfs import with_decoded_pcm, with_pcm_stats, resample_pcm
from jepl_spark.sources import audio
from jepl_spark.sources.clips import clip_row, clips_df, transcripts_df


@pytest.mark.parametrize("codec", audio.CODECS)
@pytest.mark.parametrize("i,sr,dur", [(0, 8000, 300), (5, 16000, 700), (11, 44100, 250)])
def test_codec_roundtrip_snr(codec, i, sr, dur):
    x = audio.synth_wave(i, sr, dur)
    y = audio.decode(audio.encode(x, codec), codec)
    assert len(y) == len(x)
    s = audio.snr_db(x, y)
    if codec == "pcm16":
        assert s > 60.0
    else:
        assert s >= 30.0, f"{codec}: SNR {s:.1f} dB < 30"


def test_clip_row_deterministic():
    a, b = clip_row(7), clip_row(7)
    assert a == b
    assert a["clip_id"] == "clip-000000000007"
    assert a["transcript"].startswith("transcript 7 ")


def test_spark_decode_invariant(spark):
    """Per-row invariant through the distributed path: decode(bytes) in
    a pandas UDF must allclose (SNR≥30dB) the reference waveform, and
    transcripts must be exactly equal."""
    n = 60
    df = clips_df(spark, n, partitions=4)
    rows = with_decoded_pcm(df).select("seq", "codec", "sr_hz", "dur_ms", "pcm", "transcript").collect()
    assert len(rows) == n
    seen_codecs = set()
    for r in rows:
        i = r["seq"]
        ref = audio.synth_wave(i, r["sr_hz"], r["dur_ms"])
        got = np.array(r["pcm"], dtype=np.float32)
        assert got.shape == ref.shape
        s = audio.snr_db(ref, got)
        assert s >= 30.0, f"clip {i} ({r['codec']}): SNR {s:.1f}"
        assert r["transcript"] == clip_row(i)["transcript"]
        seen_codecs.add(r["codec"])
    assert seen_codecs == set(audio.CODECS)  # skewed but all present


def test_spark_pcm_stats(spark):
    df = clips_df(spark, 20, partitions=2)
    rows = with_pcm_stats(df).select("seq", "sr_hz", "dur_ms", "stats").collect()
    for r in rows:
        st = r["stats"]
        expected_n = int(r["sr_hz"] * r["dur_ms"] / 1000)
        assert st["n_samples"] == expected_n
        assert 0.0 < st["rms"] < 1.0
        assert st["peak"] <= 1.0


def test_resample(spark):
    df = clips_df(spark, 8, partitions=2)
    rows = resample_pcm(df, 16000).select("seq", "sr_hz", "dur_ms", "pcm_rs", "sr_rs").collect()
    for r in rows:
        assert r["sr_rs"] == 16000
        expect = round(int(r["sr_hz"] * r["dur_ms"] / 1000) * 16000 / r["sr_hz"])
        assert abs(len(r["pcm_rs"]) - expect) <= 1


def test_zipf_clip_events_skew(spark):
    """The skew-test event stream is deterministic and actually skewed:
    the hot clip dominates, and repeated generation is identical."""
    from jepl_spark.sources.clips import zipf_clip_events

    a = zipf_clip_events(spark, 5000, n_clips=100, partitions=4)
    counts = {r["clip_id"]: r["n"] for r in
              a.groupBy("clip_id").count().withColumnRenamed("count", "n").collect()}
    hot = counts.get("clip-000000000000", 0)
    assert hot / 5000 > 0.15            # Zipf head is genuinely hot
    assert len(counts) > 20             # but the tail exists
    b = zipf_clip_events(spark, 5000, n_clips=100, partitions=4)
    assert b.exceptAll(a).count() == 0 and a.exceptAll(b).count() == 0


def test_engine_sql_stream_batch_shape(spark):
    """JeplEngine.sql_stream compiles a windowed rule (static frame)."""
    from jepl_spark.engine import JeplEngine
    from jepl_spark.sources.clips import BASE_TS

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({
            "v": [1.0, 2.0, 8.0],
            "k": ["a", "a", "b"],
            "event_time": [BASE_TS, BASE_TS + pd.Timedelta(seconds=10),
                           BASE_TS + pd.Timedelta(seconds=70)],
        })
    )
    eng = JeplEngine(spark)
    out = eng.sql_stream(
        "select sum(v) AS s from t where v > 0 group by k",
        df, ts_col="event_time", duration="1 minute", watermark=None,
    )
    rows = {(r["k"], r["window_start"].minute): r["s"] for r in out.collect()}
    assert rows == {("a", 0): 3.0, ("b", 1): 8.0}


def test_transcript_stream_projection(spark):
    t = transcripts_df(spark, 10, delay_s=5.0).collect()
    c = clips_df(spark, 10).select("clip_id", "event_time").collect()
    tmap = {r["clip_id"]: r for r in t}
    for r in c:
        tr = tmap[r["clip_id"]]
        assert (tr["event_time"] - r["event_time"]).total_seconds() == 5.0


# ---------------------------------------------------------------------------
# chunk_clips


def _py_chunk_plan(sr, dur_ms, chunk_ms, hop_ms, min_tail_ms):
    """Independent boundary-math reference (the oracle's formula)."""
    n = sr * dur_ms // 1000
    chunk_n = sr * chunk_ms // 1000
    hop_n = sr * hop_ms // 1000
    tail_n = sr * min_tail_ms // 1000
    fulls = (n - chunk_n) // hop_n + 1 if n >= chunk_n else 0
    plan = [(i, i * hop_n, chunk_n) for i in range(fulls)]
    ts = fulls * hop_n
    if min_tail_ms > 0 and ts < n and (n - ts) >= tail_n:
        plan.append((fulls, ts, n - ts))
    return plan


def test_chunk_boundaries_match_formula(spark):
    from jepl_spark.functions.audio_udfs import chunk_clips

    df = clips_df(spark, 30, partitions=3)
    out = chunk_clips(df, chunk_ms=250, hop_ms=200, min_tail_ms=100)
    got = {}
    for r in out.collect():
        got.setdefault(r["clip_id"], []).append(
            (r["chunk_idx"], r["start_sample"], r["n_samples"])
        )
    for i in range(30):
        row = clip_row(i)
        want = _py_chunk_plan(row["sr_hz"], row["dur_ms"], 250, 200, 100)
        assert sorted(got.get(row["clip_id"], [])) == want, row["clip_id"]


def test_chunk_pcm_content_reconstructs(spark):
    """hop == chunk with all tails kept: decoded chunks concatenate to
    the decoded original (≤1 LSB re-quantization, SNR far above the
    30 dB input_hint bar), transcripts carried through exactly."""
    from jepl_spark.functions.audio_udfs import chunk_clips

    df = clips_df(spark, 12, partitions=2)
    out = chunk_clips(df, chunk_ms=300, hop_ms=300, min_tail_ms=1)
    chunks = {}
    for r in out.collect():
        chunks.setdefault(r["clip_id"], []).append(r)
    for i in range(12):
        row = clip_row(i)
        original = audio.decode(row["bytes"], row["codec"])
        rs = sorted(chunks[row["clip_id"]], key=lambda r: r["chunk_idx"])
        assert [r["transcript"] for r in rs] == [row["transcript"]] * len(rs)
        recon = np.concatenate(
            [audio.pcm16_decode(bytes(r["bytes"])) for r in rs]
        )
        assert recon.size == original.size
        assert audio.snr_db(original, recon) > 55.0
        assert np.allclose(original, recon, atol=2.5 / 32768)


def test_chunk_tail_rules(spark):
    from jepl_spark.functions.audio_udfs import chunk_clips

    df = clips_df(spark, 6, partitions=1)
    no_tail = chunk_clips(df, chunk_ms=300, hop_ms=300, min_tail_ms=0)
    assert all(
        r["n_samples"] == r["sr_hz"] * 300 // 1000 for r in no_tail.collect()
    )
    with pytest.raises(ValueError):
        chunk_clips(df, chunk_ms=0)
    with pytest.raises(ValueError):
        chunk_clips(df, chunk_ms=100, hop_ms=-1)


def test_cross_codec_audio_near_dup_detection(spark):
    """Composition of the audio + similarity lanes: the same waveform
    encoded under different G.711 codecs must be found as a near-dup
    pair via its decoded FEATURE vector (embedding_near_dups over
    audio_features), while unrelated clips stay unpaired — codec-robust
    audio dedup, the clip-level analog of text near-dup dedup."""
    import pandas as pd

    from pyspark.sql import functions as F2

    from jepl_spark.functions.audio_udfs import with_audio_features
    from jepl_spark.operators.similarity import embedding_near_dups

    rows = []
    rid = 0
    for i in range(12):
        wave = audio.synth_wave(i, 8000, 500)
        for codec in ("pcm16", "ulaw"):  # cross-codec duplicate pair
            rows.append({
                "clip_id": f"clip-{rid:04d}", "orig": i,
                "bytes": audio.encode(wave, codec),
                "codec": codec, "sr_hz": 8000, "dur_ms": 500,
            })
            rid += 1
    df = spark.createDataFrame(pd.DataFrame(rows))
    feats = with_audio_features(df).select(
        "clip_id", "orig", F2.col("af.feat").alias("embedding")
    )
    ids = feats.withColumn(
        "vec_id", F2.regexp_replace("clip_id", "clip-", "").cast("long")
    )
    pairs = embedding_near_dups(
        ids.select("vec_id", "embedding"),
        threshold=0.99, planes=4, tables=4,
    ).collect()
    origin = {r["vec_id"]: r["orig"] for r in ids.collect()}
    found = {(min(p["id_a"], p["id_b"]), max(p["id_a"], p["id_b"]))
             for p in pairs}
    same = {p for p in found if origin[p[0]] == origin[p[1]]}
    # RECALL: every cross-codec encoding pair of the same waveform is
    # found (µ-law quantization noise keeps them ≥0.99, not ≥0.9999);
    # different waveforms MAY also pair — the 16-band envelope is a
    # coarse fingerprint and some synth waves are spectrally close,
    # which is near-dup detection working, not a defect
    assert len(same) == 12, (len(same), sorted(same))
    # and the same-waveform pairs are the TOP of the similarity order:
    # every one of them scores >= the threshold by construction
    assert same <= found


def test_detect_speech_segments(spark):
    """VAD splits at planted silence: frame-aligned zero spans produce
    exactly the formula segments; short silence does NOT split; fully
    silent and fully voiced clips yield zero and one segment."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import detect_speech_segments
    from jepl_spark.sources import audio as A

    sr, frame_ms = 8000, 20
    fn = sr * frame_ms // 1000  # 160 samples/frame

    def clip(cid, wave):
        return (cid, A.pcm16_encode(wave), "pcm16", sr)

    base = A.synth_wave(7, sr, 400)  # 3200 samples = 20 frames
    w_split = base.copy(); w_split[5 * fn:9 * fn] = 0.0   # 4-frame silence
    w_short = base.copy(); w_short[5 * fn:7 * fn] = 0.0   # 2-frame: no split
    w_all_silent = np.zeros_like(base)
    w_lead = base.copy(); w_lead[:3 * fn] = 0.0           # leading silence
    df = spark.createDataFrame(
        [clip("split", w_split), clip("short", w_short),
         clip("silent", w_all_silent), clip("lead", w_lead),
         clip("voiced", base)],
        "clip_id string, bytes binary, codec string, sr_hz int",
    )
    segs = {}
    for r in detect_speech_segments(df, frame_ms=frame_ms,
                                    min_silence_frames=3).collect():
        segs.setdefault(r["clip_id"], []).append(
            (r["seg_idx"], r["start_frame"], r["n_frames"], r["start_ms"]))
    assert sorted(segs["split"]) == [(0, 0, 5, 0), (1, 9, 11, 180)]
    assert segs["short"] == [(0, 0, 20, 0)]       # 2-frame gap kept inside
    assert "silent" not in segs                    # no speech at all
    assert segs["lead"] == [(0, 3, 17, 60)]        # no empty leading segment
    assert segs["voiced"] == [(0, 0, 20, 0)]

    import pytest as _pt
    with _pt.raises(ValueError):
        detect_speech_segments(df, frame_ms=0)
    with _pt.raises(ValueError):
        detect_speech_segments(df, min_silence_frames=0)


def test_pcm_quality_known_arrays(spark):
    """pcm_quality on hand-built waves: full-scale square -> clipping
    1.0 / crest 0 dB; near-zero wave -> silence 1.0; empty -> NULLs."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import with_audio_quality
    from jepl_spark.sources import audio as AU

    rows = [
        ("sq", AU.encode(np.ones(800, dtype=np.float32), "pcm16"), "pcm16"),
        ("quiet", AU.encode(np.full(800, 1e-4, dtype=np.float32), "pcm16"),
         "pcm16"),
        ("empty", AU.encode(np.zeros(0, dtype=np.float32), "pcm16"),
         "pcm16"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r.clip_id: r.aq.asDict()
           for r in with_audio_quality(df).collect()}
    assert got["sq"]["clipping_ratio"] == 1.0
    assert abs(got["sq"]["crest_db"]) < 0.01
    assert got["sq"]["silence_ratio"] == 0.0
    assert got["quiet"]["silence_ratio"] == 1.0
    assert got["quiet"]["clipping_ratio"] == 0.0
    assert got["empty"]["n_samples"] == 0
    assert got["empty"]["crest_db"] is None


def test_codec_rail_detection(spark):
    """A hard-clipped wave trips clipping detection under ALL three
    codecs — companded codecs rail below 1.0, so the threshold must
    derive from the codec (ulaw rails at 0.9803)."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import with_audio_quality
    from jepl_spark.sources import audio as AU

    t = np.arange(1600, dtype=np.float64) / 8000.0
    wave = np.clip(
        3.0 * np.sin(2 * np.pi * 440.0 * t), -1.0, 1.0
    ).astype(np.float32)
    rows = [(c, AU.encode(wave, c), c) for c in AU.CODECS]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r.clip_id: r.aq["clipping_ratio"]
           for r in with_audio_quality(df).collect()}
    for c in AU.CODECS:
        assert got[c] > 0.3, (c, got[c])


def test_speech_rate_matches_vad_and_counts_tokens(spark):
    """voiced_ms agrees with detect_speech_segments' segment sum by
    construction across a parameter sweep; token counting handles
    blank / NULL / multi-space transcripts; rate is NULL when nothing
    is voiced."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import (
        detect_speech_segments,
        speech_rate,
    )
    from jepl_spark.sources import audio as AU

    rows = []
    for i in range(24):
        sr = (8000, 16000)[i % 2]
        dur = 300 + i * 97
        wave = AU.synth_wave(i, sr, dur).copy()
        frame_n = sr * 20 // 1000
        f0, k = 1 + i % 5, 2 + i % 4
        wave[f0 * frame_n:(f0 + k) * frame_n] = 0.0
        if i % 7 == 0:
            wave[:] = 0.0
        txt = " ".join(f"w{j}" for j in range(i % 9))
        if i % 5 == 0:
            txt = "  " + txt + "  "          # stray whitespace
        if i == 3:
            txt = None
        rows.append((f"c{i:03d}", AU.encode(wave, "pcm16"), "pcm16",
                     sr, txt))
    schema = ("clip_id string, bytes binary, codec string, "
              "sr_hz int, transcript string")
    df = spark.createDataFrame(rows, schema)

    from pyspark.sql import functions as F

    got = {r.clip_id: r for r in speech_rate(df).collect()}
    segs = detect_speech_segments(df).groupBy("clip_id").agg(
        F.sum("dur_ms").alias("v")).collect()
    vad = {r.clip_id: r.v for r in segs}
    for i in range(24):
        cid = f"c{i:03d}"
        assert got[cid].voiced_ms == vad.get(cid, 0), cid
        want_tokens = 0 if i == 3 else i % 9
        assert got[cid].n_tokens == want_tokens, cid
        if got[cid].voiced_ms == 0:
            assert got[cid].tokens_per_voiced_s is None
        else:
            assert abs(got[cid].tokens_per_voiced_s
                       - want_tokens / (got[cid].voiced_ms / 1000.0)) < 1e-12

    import pytest as _pt
    with _pt.raises(ValueError):
        speech_rate(df, frame_ms=0)


def test_admit_paired_clips_reasons(spark):
    """Every reject_reason fires on a purpose-built pair; precedence
    empty_pair > empty_transcript > no_speech > too_fast > too_slow."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import admit_paired_clips
    from jepl_spark.sources import audio as AU

    sr = 8000
    voiced = (0.5 * np.sin(np.arange(sr, dtype=np.float64) / 8.0)) \
        .astype(np.float32)                     # 1 s fully voiced
    voiced3 = (0.5 * np.sin(np.arange(3 * sr, dtype=np.float64) / 8.0)) \
        .astype(np.float32)                     # 3 s fully voiced
    silent = np.zeros(sr, dtype=np.float32)
    mk = AU.encode
    rows = [
        ("ok",    mk(voiced, "pcm16"), "pcm16", sr, "three token line"),
        ("fast",  mk(voiced, "pcm16"), "pcm16", sr,
         " ".join(["w"] * 20)),                  # 20 tps > 8
        ("slow",  mk(voiced3, "pcm16"), "pcm16", sr, "one"),  # 0.33 tps
        ("no_sp", mk(silent, "pcm16"), "pcm16", sr, "ghost words"),
        ("no_tx", mk(voiced, "pcm16"), "pcm16", sr, ""),
        ("both",  mk(silent, "pcm16"), "pcm16", sr, ""),
    ]
    schema = ("clip_id string, bytes binary, codec string, "
              "sr_hz int, transcript string")
    df = spark.createDataFrame(rows, schema)
    got = {r.clip_id: r.reject_reason
           for r in admit_paired_clips(df, min_tps=1.0,
                                       max_tps=8.0).collect()}
    assert got == {
        "ok": None, "fast": "too_fast", "slow": "too_slow",
        "no_sp": "no_speech", "no_tx": "empty_transcript",
        "both": "empty_pair",
    }


def test_time_mask_clips_deterministic_and_zeroed(spark):
    """Mask metadata matches the md5 formula; samples inside every
    span decode to exact zero, samples outside are untouched
    (pcm16 roundtrip is bit-exact); same seed reproduces, a different
    seed moves at least one mask."""
    import hashlib

    import numpy as np

    from jepl_spark.functions.audio_udfs import time_mask_clips
    from jepl_spark.sources import audio as AU

    def h60(k):
        return int(hashlib.md5(k.encode()).hexdigest()[:15], 16)

    sr = 8000
    rows = []
    waves = {}
    for i in range(6):
        n = sr * (300 + 370 * i) // 1000
        w = (0.4 * np.sin(np.arange(n) / 3.0) + 0.2).astype(np.float32)
        cid = f"c{i}"
        waves[cid] = AU.decode(AU.encode(w, "pcm16"), "pcm16")
        rows.append((cid, AU.encode(w, "pcm16"), "pcm16", sr))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int")

    out = {r.clip_id: r for r in time_mask_clips(
        df, n_masks=2, max_mask_ms=120).collect()}
    for cid, orig in waves.items():
        dur_eff = orig.size * 1000 // sr
        got = [(m.mask_idx, m.start_ms, m.len_ms)
               for m in out[cid].masks]
        want, spans = [], []
        for j in range(2):
            ln = 1 + h60(f"mask:{cid}:{j}:L") % 120
            st = h60(f"mask:{cid}:{j}:S") % max(1, dur_eff - ln + 1)
            want.append((j, st, ln))
            spans.append((st * sr // 1000,
                          st * sr // 1000 + ln * sr // 1000))
        assert got == want, cid
        dec = AU.decode(bytes(out[cid].bytes), "pcm16")
        mask = np.zeros(orig.size, dtype=bool)
        for a, b in spans:
            mask[a:b] = True
        assert np.all(dec[mask] == 0.0)
        assert np.array_equal(dec[~mask], orig[~mask])

    again = {r.clip_id: [(m.mask_idx, m.start_ms, m.len_ms)
                         for m in r.masks]
             for r in time_mask_clips(df, n_masks=2,
                                      max_mask_ms=120).collect()}
    moved = {r.clip_id: [(m.mask_idx, m.start_ms, m.len_ms)
                         for m in r.masks]
             for r in time_mask_clips(df, n_masks=2, max_mask_ms=120,
                                      seed="epoch2").collect()}
    assert all(again[c] == [(m.mask_idx, m.start_ms, m.len_ms)
                            for m in out[c].masks] for c in waves)
    assert any(moved[c] != again[c] for c in waves)

    import pytest as _pt
    with _pt.raises(ValueError):
        time_mask_clips(df, n_masks=0)
    with _pt.raises(ValueError):
        time_mask_clips(df, max_mask_ms=0)


def test_time_mask_clips_wav_container(spark):
    """codec='wav' rows re-encode through the container with the
    inner codec preserved; the masked span decodes to (near-)zero."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import time_mask_clips
    from jepl_spark.sources.containers import wav_decode, wav_encode

    sr = 8000
    w = (0.5 * np.sin(np.arange(2 * sr) / 4.0)).astype(np.float32)
    df = spark.createDataFrame(
        [("wv", wav_encode(w, sr, "ulaw"), "wav", sr)],
        "clip_id string, bytes binary, codec string, sr_hz int")
    r = time_mask_clips(df, n_masks=1, max_mask_ms=200).collect()[0]
    dec, got_sr, inner = wav_decode(bytes(r.bytes))
    assert (got_sr, inner) == (sr, "ulaw")
    m = r.masks[0]
    a = m.start_ms * sr // 1000
    b = a + m.len_ms * sr // 1000
    # ulaw's zero code decodes to exactly 0.0
    assert np.all(dec[a:b] == 0.0)
    assert dec.size == w.size


def test_encoded_domain_ops_fuzz(spark):
    """Property sweep over the three encoded-domain editors (trim,
    time-mask, speed-perturb) and gain: random lengths / codecs /
    container wrapping / silence layouts — outputs always decode, the
    documented length/metadata invariants hold, and no non-ValueError
    ever escapes (the package-wide decoder error contract)."""
    import random

    import numpy as np

    from jepl_spark.functions.audio_udfs import (
        normalize_gain_clips,
        speed_perturb_clips,
        time_mask_clips,
        trim_silence_clips,
    )
    from jepl_spark.sources import audio as AU
    from jepl_spark.sources.containers import wav_decode, wav_encode

    rng = random.Random(20260817)
    rows = []
    for i in range(60):
        sr = rng.choice((8000, 16000, 44100))
        n = rng.randrange(0, 4000)
        w = (0.5 * np.sin(np.arange(n) / rng.uniform(2, 30))) \
            .astype(np.float32)
        if n and rng.random() < 0.3:          # random silent prefix
            w[: rng.randrange(0, n)] = 0.0
        codec = rng.choice(("pcm16", "ulaw", "alaw", "wav"))
        if codec == "wav":
            inner = rng.choice(("pcm16", "ulaw", "alaw"))
            b = wav_encode(w, sr, inner)
        else:
            b = AU.encode(w, codec)
        rows.append((f"f{i:03d}", b, codec, sr))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int")
    orig_n = {r[0]: AU.decode(r[1], r[2]).size for r in rows}

    for r in trim_silence_clips(df).collect():
        assert r.n_total == orig_n[r.clip_id]
        assert 0 <= r.n_samples_out <= r.n_total
        dec = AU.decode(bytes(r.bytes), r.codec)
        assert dec.size == r.n_samples_out
    for r in time_mask_clips(df, n_masks=2, max_mask_ms=90).collect():
        dec = AU.decode(bytes(r.bytes), r.codec)
        assert dec.size == orig_n[r.clip_id]      # masking never resizes
        assert len(r.masks) == 2
        for m in r.masks:
            assert 1 <= m.len_ms <= 90 and m.start_ms >= 0
    for r in speed_perturb_clips(df).collect():
        n = orig_n[r.clip_id]
        assert r.n_samples == n * r.factor_den // r.factor_num
        assert AU.decode(bytes(r.bytes), r.codec).size == r.n_samples
        if r.codec == "wav":
            wav_decode(bytes(r.bytes))            # container stays valid
    for r in normalize_gain_clips(df).collect():
        dec = AU.decode(bytes(r.bytes), r.codec)
        assert dec.size == orig_n[r.clip_id]
        if r.gain_db is not None and dec.size:
            assert float(np.max(np.abs(dec))) <= 0.9905


def test_trim_silence_known_answers(spark):
    """Planted frame-aligned lead/tail silence trims exactly; the
    surviving bytes are a bit-identical slice of the input; trailing
    voiced content keeps the partial frame; all-silent empties; a
    sub-frame clip passes through."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import trim_silence_clips
    from jepl_spark.sources import audio as AU

    sr = 8000
    frame_n = sr * 20 // 1000  # 160
    n = 1000                   # 6 full frames + 40-sample partial
    base = (0.4 * np.sin(np.arange(n) / 3.0) + 0.2).astype(np.float32)

    lead_tail = base.copy()
    lead_tail[: 2 * frame_n] = 0.0       # 2 lead frames
    lead_tail[5 * frame_n :] = 0.0       # last full frame + partial
    tail_voiced = base.copy()
    tail_voiced[:frame_n] = 0.0          # 1 lead frame, voiced to end
    rows = [
        ("lt", AU.encode(lead_tail, "pcm16"), "pcm16", sr),
        ("tv", AU.encode(tail_voiced, "pcm16"), "pcm16", sr),
        ("sil", AU.encode(np.zeros(n, dtype=np.float32), "pcm16"),
         "pcm16", sr),
        ("tiny", AU.encode(base[:100], "pcm16"), "pcm16", sr),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int")
    got = {r.clip_id: r for r in trim_silence_clips(df).collect()}

    r = got["lt"]
    assert (r.lead_samples, r.n_samples_out, r.n_total) == (
        2 * frame_n, 3 * frame_n, n)
    assert bytes(r.bytes) == AU.encode(lead_tail, "pcm16")[
        2 * frame_n * 2 : 5 * frame_n * 2]
    r = got["tv"]
    assert (r.lead_samples, r.n_samples_out) == (frame_n, n - frame_n)
    r = got["sil"]
    assert (r.lead_samples, r.n_samples_out) == (n, 0)
    assert bytes(r.bytes) == b""
    r = got["tiny"]
    assert (r.lead_samples, r.n_samples_out, r.n_total) == (0, 100, 100)
    assert bytes(r.bytes) == AU.encode(base[:100], "pcm16")


def test_trim_silence_wav_container(spark):
    import numpy as np

    from jepl_spark.functions.audio_udfs import trim_silence_clips
    from jepl_spark.sources.containers import wav_decode, wav_encode

    sr = 8000
    frame_n = 160
    w = (0.4 * np.sin(np.arange(1600) / 3.0) + 0.2).astype(np.float32)
    w[: 3 * frame_n] = 0.0
    df = spark.createDataFrame(
        [("wv", wav_encode(w, sr, "ulaw"), "wav", sr)],
        "clip_id string, bytes binary, codec string, sr_hz int")
    r = trim_silence_clips(df).collect()[0]
    assert r.lead_samples == 3 * frame_n
    dec, got_sr, inner = wav_decode(bytes(r.bytes))
    assert (got_sr, inner) == (sr, "ulaw")
    full, _, _ = wav_decode(wav_encode(w, sr, "ulaw"))
    assert np.array_equal(dec, full[3 * frame_n :])


def test_normalize_gain_known_answers(spark):
    """Known-rms waves: a sine of amplitude a has rms a/√2 → gain to
    -20 dBFS is 0.1·√2/a; a loud full-scale square hits the PEAK cap
    instead; silence and empty pass through bit-identical with NULL
    gain_db; post-gain rms lands on target within quantization."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import normalize_gain_clips
    from jepl_spark.sources import audio as AU

    sr, n = 8000, 8000
    sine = (0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / sr)) \
        .astype(np.float32)
    loud = np.full(n, 0.05, dtype=np.float32)   # rms ~0.058 < 0.1
    loud[:8] = 0.9                              # but peak 0.9 caps gain
    silent = np.zeros(n, dtype=np.float32)
    rows = [
        ("sine", AU.encode(sine, "pcm16"), "pcm16", sr),
        ("loudpeak", AU.encode(loud, "pcm16"), "pcm16", sr),
        ("silent", AU.encode(silent, "pcm16"), "pcm16", sr),
        ("empty", AU.encode(np.zeros(0, dtype=np.float32), "pcm16"),
         "pcm16", sr),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int")
    got = {r.clip_id: r for r in normalize_gain_clips(df).collect()}

    dec = AU.decode(bytes(got["sine"].bytes), "pcm16")
    rms = float(np.sqrt(np.mean(dec.astype(np.float64) ** 2)))
    assert abs(rms - 0.1) < 1e-3
    x = AU.decode(AU.encode(sine, "pcm16"), "pcm16").astype(np.float64)
    want_gain = 0.1 / float(np.sqrt(np.mean(x * x)))
    assert abs(got["sine"].gain_db - 20 * np.log10(want_gain)) < 1e-9

    xl = AU.decode(AU.encode(loud, "pcm16"), "pcm16").astype(np.float64)
    cap = 0.99 / float(np.max(np.abs(xl)))
    assert cap < 0.1 / float(np.sqrt(np.mean(xl * xl)))
    assert abs(got["loudpeak"].gain_db - 20 * np.log10(cap)) < 1e-9
    decl = AU.decode(bytes(got["loudpeak"].bytes), "pcm16")
    assert float(np.max(np.abs(decl))) <= 0.9903  # never clips

    assert got["silent"].gain_db is None
    assert bytes(got["silent"].bytes) == AU.encode(silent, "pcm16")
    assert got["empty"].gain_db is None

    import pytest as _pt
    with _pt.raises(ValueError):
        normalize_gain_clips(df, peak_limit=0.0)


def test_normalize_gain_wav_container(spark):
    import numpy as np

    from jepl_spark.functions.audio_udfs import normalize_gain_clips
    from jepl_spark.sources.containers import wav_decode, wav_encode

    sr = 8000
    w = (0.02 * np.sin(np.arange(2 * sr) / 4.0)).astype(np.float32)
    df = spark.createDataFrame(
        [("wv", wav_encode(w, sr, "pcm16"), "wav", sr)],
        "clip_id string, bytes binary, codec string, sr_hz int")
    r = normalize_gain_clips(df).collect()[0]
    dec, got_sr, inner = wav_decode(bytes(r.bytes))
    assert (got_sr, inner) == (sr, "pcm16")
    rms = float(np.sqrt(np.mean(dec.astype(np.float64) ** 2)))
    assert abs(rms - 0.1) < 1e-3 and r.gain_db > 0


def test_speed_perturb_lengths_and_identity(spark):
    """n_out = n·den div num per factor; the identity factor passes
    bytes through bit-identical; resampled content equals the numpy
    reference through the same codec roundtrip."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import speed_perturb_clips
    from jepl_spark.sources import audio as AU

    sr = 8000
    waves = {}
    rows = []
    for i, n in enumerate((1600, 2401, 803)):
        w = (0.5 * np.sin(np.arange(n) / 7.0)).astype(np.float32)
        cid = f"c{i}"
        waves[cid] = w
        rows.append((cid, AU.encode(w, "pcm16"), "pcm16", sr))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int")
    out = speed_perturb_clips(df).collect()
    assert len(out) == 9
    for r in out:
        w = waves[r.clip_id]
        n = w.size
        want_n = n * r.factor_den // r.factor_num
        assert r.n_samples == want_n
        if (r.factor_num, r.factor_den) == (1, 1):
            assert bytes(r.bytes) == AU.encode(w, "pcm16")
        else:
            x = AU.decode(AU.encode(w, "pcm16"), "pcm16")
            t_out = np.linspace(0.0, n - 1, want_n)
            want = AU.decode(AU.encode(
                np.interp(t_out, np.arange(n), x).astype(np.float32),
                "pcm16"), "pcm16")
            got = AU.decode(bytes(r.bytes), "pcm16")
            assert np.array_equal(got, want), (r.clip_id, r.factor_num)

    import pytest as _pt
    with _pt.raises(ValueError):
        speed_perturb_clips(df, factors=())
    with _pt.raises(ValueError):
        speed_perturb_clips(df, factors=((0, 1),))


def test_speed_perturb_wav_container(spark):
    import numpy as np

    from jepl_spark.functions.audio_udfs import speed_perturb_clips
    from jepl_spark.sources.containers import wav_decode, wav_encode

    sr = 8000
    w = (0.5 * np.sin(np.arange(1800) / 6.0)).astype(np.float32)
    df = spark.createDataFrame(
        [("wv", wav_encode(w, sr, "ulaw"), "wav", sr)],
        "clip_id string, bytes binary, codec string, sr_hz int")
    got = {(r.factor_num, r.factor_den): r
           for r in speed_perturb_clips(df).collect()}
    x, got_sr, inner = wav_decode(bytes(got[(9, 10)].bytes))
    assert (got_sr, inner) == (sr, "ulaw")
    assert x.size == 1800 * 10 // 9 == got[(9, 10)].n_samples
    assert bytes(got[(1, 1)].bytes) == wav_encode(w, sr, "ulaw")


def _chunked(spark, n_samples, transcript, chunk_ms, hop_ms, tail_ms,
             sr=1000):
    import numpy as np

    from jepl_spark.functions.audio_udfs import chunk_clips
    from jepl_spark.sources import audio as AU

    wave = (0.4 * np.sin(np.arange(n_samples) / 5.0)).astype(np.float32)
    df = spark.createDataFrame(
        [("c0", AU.encode(wave, "pcm16"), "pcm16", sr, transcript)],
        "clip_id string, bytes binary, codec string, sr_hz int, "
        "transcript string",
    )
    return chunk_clips(df, chunk_ms=chunk_ms, hop_ms=hop_ms,
                       min_tail_ms=tail_ms)


def test_align_transcript_known_answer(spark):
    """1000 samples, 4 non-overlapping 250-sample chunks, 8 tokens →
    exactly 2 tokens per chunk, in order."""
    from jepl_spark.functions.audio_udfs import align_transcript_to_chunks

    out = align_transcript_to_chunks(
        _chunked(spark, 1000, "a b c d e f g h", 250, 250, 0))
    got = {r.chunk_idx: (r.tok_start, r.tok_end, r.chunk_text)
           for r in out.collect()}
    assert got == {0: (0, 2, "a b"), 1: (2, 4, "c d"),
                   2: (4, 6, "e f"), 3: (6, 8, "g h")}


def test_align_transcript_concat_property(spark):
    """With hop == chunk and the tail kept, the chunk texts
    concatenate back to the whole (trimmed) transcript; spans are
    monotone and within bounds."""
    from jepl_spark.functions.audio_udfs import align_transcript_to_chunks

    txt = " ".join(f"t{i}" for i in range(13))
    rows = sorted(
        align_transcript_to_chunks(
            _chunked(spark, 1037, txt, 300, 300, 1)).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert rows[-1].start_sample + rows[-1].n_samples == 1037
    joined = " ".join(r.chunk_text for r in rows if r.chunk_text)
    assert joined == txt
    prev = 0
    for r in rows:
        assert r.tok_start == prev and r.tok_end >= r.tok_start
        prev = r.tok_end
    assert prev == 13


def test_align_transcript_overlap_and_empty(spark):
    """Overlapping chunks get overlapping spans; an empty transcript
    yields empty spans and ''; missing n_total raises."""
    import pytest as _pt

    from jepl_spark.functions.audio_udfs import align_transcript_to_chunks

    rows = sorted(
        align_transcript_to_chunks(
            _chunked(spark, 1000, "a b c d e f g h", 500, 250, 0)
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    spans = [(r.tok_start, r.tok_end) for r in rows]
    assert spans == [(0, 4), (2, 6), (4, 8)]
    assert rows[1].chunk_text == "c d e f"

    empty = align_transcript_to_chunks(
        _chunked(spark, 1000, "   ", 250, 250, 0)).collect()
    assert all(r.tok_start == 0 and r.tok_end == 0 and r.chunk_text == ""
               for r in empty)

    with _pt.raises(ValueError, match="n_total"):
        align_transcript_to_chunks(
            _chunked(spark, 1000, "x", 250, 250, 0).drop("n_total"))


def test_codec_rail_wav_container_uses_inner_codec(spark):
    """codec='wav' is a container label: the clipping rail must come
    from the RIFF header's inner sample format.  A hard-clipped ulaw
    payload inside a wav rails at 0.9803 — a naive full-scale 0.999
    threshold would report zero clipping."""
    import numpy as np
    import pytest as _pt

    from jepl_spark.functions.audio_udfs import (
        _codec_rail,
        with_audio_quality,
    )
    from jepl_spark.sources.containers import wav_encode

    with _pt.raises(ValueError, match="container label"):
        _codec_rail("wav")

    t = np.arange(1600, dtype=np.float64) / 8000.0
    wave = np.clip(
        3.0 * np.sin(2 * np.pi * 440.0 * t), -1.0, 1.0
    ).astype(np.float32)
    rows = [
        ("wav_ulaw", wav_encode(wave, 8000, "ulaw"), "wav"),
        ("wav_pcm16", wav_encode(wave, 8000, "pcm16"), "wav"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r.clip_id: r.aq["clipping_ratio"]
           for r in with_audio_quality(df).collect()}
    for k, v in got.items():
        assert v > 0.3, (k, v)


def test_admit_clips_reason_precedence(spark):
    """An empty clip reports 'empty' even though its silence_ratio is
    1.0; clipping wins over silence when both trip."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import admit_clips
    from jepl_spark.sources import audio as AU

    clipped_and_quiet_gap = np.concatenate([
        np.ones(100, dtype=np.float32),           # rails
        np.zeros(900, dtype=np.float32),          # silence 0.9 of samples
    ])
    rows = [
        ("empty", AU.encode(np.zeros(0, dtype=np.float32), "pcm16"), "pcm16"),
        ("both", AU.encode(clipped_and_quiet_gap, "pcm16"), "pcm16"),
        ("fine", AU.encode(
            (0.5 * np.sin(np.arange(800) / 8.0)).astype(np.float32),
            "pcm16"), "pcm16"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r.clip_id: r.reject_reason
           for r in admit_clips(df, max_clipping_ratio=0.05,
                                max_silence_ratio=0.85).collect()}
    assert got == {"empty": "empty", "both": "clipped", "fine": None}


def test_encoded_editors_reject_sr_mismatch(spark):
    """A WAV row whose sr_hz column disagrees with the RIFF header rate
    fails fast in every encoded-domain editor (ADVICE r6): the editors
    do span arithmetic in the column's rate, so a silent mismatch would
    corrupt the edit and restamp the header at a new playback speed."""
    import numpy as np
    import pytest
    from py4j.protocol import Py4JJavaError

    from jepl_spark.functions.audio_udfs import (
        normalize_gain_clips,
        speed_perturb_clips,
        time_mask_clips,
        trim_silence_clips,
    )
    from jepl_spark.sources.containers import wav_encode

    w = (0.4 * np.sin(np.arange(8000) / 5.0)).astype(np.float32)
    # header says 8000 Hz, column says 16000 Hz
    df = spark.createDataFrame(
        [("bad", wav_encode(w, 8000, "pcm16"), "wav", 16000)],
        "clip_id string, bytes binary, codec string, sr_hz int")
    for op in (trim_silence_clips, time_mask_clips,
               speed_perturb_clips, normalize_gain_clips):
        with pytest.raises(Exception) as ei:
            op(df).collect()
        # the worker-side ValueError surfaces through Spark's Python
        # runner; its message must carry the diagnostic
        assert "sr_hz column says 16000" in str(ei.value), op.__name__

    # consistent rows still pass through every editor
    ok = spark.createDataFrame(
        [("ok", wav_encode(w, 8000, "pcm16"), "wav", 8000)],
        "clip_id string, bytes binary, codec string, sr_hz int")
    assert trim_silence_clips(ok).count() == 1
    assert normalize_gain_clips(ok).count() == 1


def test_admit_paired_rejects_stray_rate_kwargs(spark):
    """rate_kwargs on a pre-rated input raise instead of being silently
    ignored (ADVICE r6)."""
    import pytest

    from jepl_spark.functions.audio_udfs import admit_paired_clips

    df = spark.createDataFrame(
        [("c", 1000, 5, 5.0)],
        "clip_id string, voiced_ms long, n_tokens long, "
        "tokens_per_voiced_s double")
    with pytest.raises(ValueError, match="tokens_per_voiced_s"):
        admit_paired_clips(df, frame_ms=10)
    # no kwargs → the precomputed rate is used as-is
    out = admit_paired_clips(df).collect()[0]
    assert out.reject_reason is None


def _prep_corpus(spark, n=90, with_wav=False, with_ts=False):
    """Mixed corpus for the composed-prep parity tests: planted
    clipped (i%11==4), all-silent (i%13==0), frame-aligned lead/tail
    silence (i%6, i%4 frames), transcripts of i%5 tokens."""
    import numpy as np
    import pandas as pd

    from jepl_spark.sources import audio as A
    from jepl_spark.sources.containers import wav_encode

    srs = (8000, 16000, 44100)
    rows = []
    for i in range(n):
        sr = srs[i % 3]
        dur = 200 + (i * 37) % 1801
        wave = A.synth_wave(i, sr, dur).copy()
        if i % 11 == 4:
            wave = np.clip(wave * 4.0, -1.0, 1.0).astype(np.float32)
        fn = sr * 20 // 1000
        nf = wave.size // fn
        k0, k1 = i % 6, i % 4
        wave[: k0 * fn] = 0.0
        if k1 > 0:
            wave[(nf - k1) * fn:] = 0.0
        if i % 13 == 0:
            wave[:] = 0.0
        if with_wav and i % 5 == 2:
            blob, codec = wav_encode(wave, sr, "pcm16"), "wav"
        else:
            blob, codec = A.encode(wave, "pcm16"), "pcm16"
        tr = " ".join(f"w{t}" for t in range(i % 5))
        row = {"clip_id": f"clip-{i:012d}", "bytes": blob,
               "codec": codec, "sr_hz": sr, "transcript": tr}
        if with_ts:
            row["event_time"] = pd.Timestamp("2024-01-01") + \
                pd.Timedelta(seconds=i)
        rows.append(row)
    schema = ("clip_id string, bytes binary, codec string, sr_hz int, "
              "transcript string")
    if with_ts:
        schema += ", event_time timestamp"
    return spark.createDataFrame(pd.DataFrame(rows), schema)


def test_prepare_clips_matches_staged_pipeline(spark):
    """THE fusion-parity receipt: the one-decode composed operator
    (prepare_clips) produces bit-for-bit the same chunk rows —
    including chunk BYTES — as the four standalone stages run in
    sequence (admit_clips → admit_paired_clips → trim_silence_clips →
    chunk_clips), on a corpus mixing wav containers, planted clipping,
    planted silence layouts, and empty transcripts."""
    from pyspark.sql import functions as F

    from jepl_spark.functions.audio_udfs import (
        admit_clips,
        admit_paired_clips,
        chunk_clips,
        prepare_clips,
        trim_silence_clips,
    )

    df = _prep_corpus(spark, 90, with_wav=True)
    kw = dict(min_tps=2.0, max_tps=30.0, chunk_ms=250, hop_ms=200,
              min_tail_ms=100)

    composed = prepare_clips(df, **kw)

    staged = (
        admit_clips(df)
        .where(F.col("reject_reason").isNull())
        .drop("aq", "reject_reason")
    )
    staged = (
        admit_paired_clips(staged, min_tps=2.0, max_tps=30.0)
        .where(F.col("reject_reason").isNull())
        .drop("voiced_ms", "n_tokens", "tokens_per_voiced_s",
              "reject_reason")
    )
    staged = trim_silence_clips(staged).drop(
        "lead_samples", "n_samples_out", "n_total"
    )
    staged = chunk_clips(staged, chunk_ms=250, hop_ms=200, min_tail_ms=100)

    def norm(frame):
        return sorted(
            (r.clip_id, r.chunk_idx, r.start_sample, r.n_samples,
             r.n_total, r.sr_hz, r.codec, bytes(r.bytes), r.transcript)
            for r in frame.collect()
        )

    got, want = norm(composed), norm(staged)
    assert len(got) > 50  # the corpus genuinely chunks
    assert got == want

    # the one-decode plan receipt: composed = ONE Python exec node;
    # staged = at least three (Spark may co-batch the two scalar
    # Arrow UDFs into one ArrowEvalPython node, but the two
    # MapInPandas stages and at least one Arrow stage always stand
    # apart — each is its own decode of the audio bytes)
    cp = composed._jdf.queryExecution().executedPlan().toString()
    sp = staged._jdf.queryExecution().executedPlan().toString()
    n_py = cp.count("MapInPandas") + cp.count("ArrowEvalPython")
    n_staged = sp.count("MapInPandas") + sp.count("ArrowEvalPython")
    assert n_py == 1, cp
    assert n_staged >= 3, sp


def test_prepare_clips_event_time_passthrough_and_validation(spark):
    import pytest

    from jepl_spark.functions.audio_udfs import prepare_clips

    df = _prep_corpus(spark, 30, with_ts=True)
    out = prepare_clips(df, min_tps=0.01, max_tps=1000.0)
    assert "event_time" in out.columns
    r = out.limit(1).collect()[0]
    assert r.event_time is not None
    with pytest.raises(ValueError):
        prepare_clips(df, chunk_ms=0)
    with pytest.raises(ValueError):
        prepare_clips(df.drop("transcript"))


def test_prepare_clips_parity_random_sweep(spark):
    """Randomized fusion-parity sweep: 6 corpora with random silence
    layouts, gains, codecs, container wrapping, transcript lengths,
    and stage parameters — the fused pass must equal the staged
    pipeline bit-for-bit on every one (seeded; deterministic)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from jepl_spark.functions.audio_udfs import (
        admit_clips,
        admit_paired_clips,
        chunk_clips,
        prepare_clips,
        trim_silence_clips,
    )
    from jepl_spark.sources import audio as A
    from jepl_spark.sources.containers import wav_encode

    rng = np.random.default_rng(42)
    srs = (8000, 16000, 44100)
    for sweep in range(6):
        rows = []
        for i in range(25):
            sr = srs[int(rng.integers(3))]
            dur = int(rng.integers(150, 2200))
            n = sr * dur // 1000
            w = (rng.uniform(0.05, 0.9)
                 * np.sin(np.arange(n) / rng.uniform(2, 30))
                 ).astype(np.float32)
            # random zero spans anywhere (not frame-aligned)
            for _ in range(int(rng.integers(0, 4))):
                a = int(rng.integers(0, max(1, n)))
                b = min(n, a + int(rng.integers(0, n // 2 + 1)))
                w[a:b] = 0.0
            if rng.random() < 0.1:
                w *= 4.0
                np.clip(w, -1.0, 1.0, out=w)
            if rng.random() < 0.3:
                blob, codec = wav_encode(w, sr, "ulaw"), "wav"
            else:
                c = ("pcm16", "ulaw", "alaw")[int(rng.integers(3))]
                blob, codec = A.encode(w, c), c
            tr = " ".join(
                f"t{j}" for j in range(int(rng.integers(0, 9)))
            )
            rows.append({"clip_id": f"c{sweep}-{i:03d}", "bytes": blob,
                         "codec": codec, "sr_hz": sr, "transcript": tr})
        df = spark.createDataFrame(pd.DataFrame(rows),
                                   "clip_id string, bytes binary, "
                                   "codec string, sr_hz int, "
                                   "transcript string")
        kw = dict(
            min_tps=float(rng.uniform(0.1, 2.0)),
            max_tps=float(rng.uniform(20.0, 200.0)),
            chunk_ms=int(rng.integers(120, 400)),
            hop_ms=int(rng.integers(100, 400)),
            min_tail_ms=int(rng.choice([0, 50, 120])),
            frame_ms=int(rng.choice([10, 20, 25])),
        )
        composed = prepare_clips(df, **kw)
        staged = (
            admit_clips(df)
            .where(F.col("reject_reason").isNull())
            .drop("aq", "reject_reason")
        )
        staged = (
            admit_paired_clips(
                staged, min_tps=kw["min_tps"], max_tps=kw["max_tps"],
                frame_ms=kw["frame_ms"],
            )
            .where(F.col("reject_reason").isNull())
            .drop("voiced_ms", "n_tokens", "tokens_per_voiced_s",
                  "reject_reason")
        )
        staged = trim_silence_clips(staged, frame_ms=kw["frame_ms"]).drop(
            "lead_samples", "n_samples_out", "n_total"
        )
        staged = chunk_clips(staged, chunk_ms=kw["chunk_ms"],
                             hop_ms=kw["hop_ms"],
                             min_tail_ms=kw["min_tail_ms"])

        def norm(frame):
            return sorted(
                (r.clip_id, r.chunk_idx, r.start_sample, r.n_samples,
                 r.n_total, r.sr_hz, bytes(r.bytes))
                for r in frame.collect()
            )

        assert norm(composed) == norm(staged), (sweep, kw)


def test_resample_clips_roundtrip_and_identity(spark):
    """Clip-level canonical-rate resampling: output lengths follow the
    shared round(n·r) core, same-rate rows pass bit-identical (incl.
    WAV), WAV rows rebuild at the target rate with the inner codec
    preserved, dur_ms recomputes, and header/column rate mismatches
    raise."""
    import numpy as np
    import pytest

    from jepl_spark.functions.audio_udfs import resample_clips, resample_to
    from jepl_spark.sources import audio as AU
    from jepl_spark.sources.containers import wav_encode, wav_payload_span

    rows = []
    for i, sr in enumerate((8000, 16000, 44100)):
        n = sr * (400 + 100 * i) // 1000
        w = (0.3 * np.sin(np.arange(n) / (3.0 + i))).astype(np.float32)
        rows.append((f"c{i}", AU.encode(w, "pcm16"), "pcm16", sr,
                     n * 1000 // sr))
    # a wav row at 8 kHz with ulaw inside
    wn = 8000 * 300 // 1000
    ww = (0.2 * np.sin(np.arange(wn) / 4.0)).astype(np.float32)
    rows.append(("cw", wav_encode(ww, 8000, codec="ulaw"), "wav", 8000, 300))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int, "
        "dur_ms int")
    out = {r["clip_id"]: r for r in resample_clips(df, 16000).collect()}

    for i, sr in enumerate((8000, 16000, 44100)):
        r = out[f"c{i}"]
        src_bytes, n_in = rows[i][1], len(rows[i][1]) // 2
        assert r["sr_hz"] == 16000
        if sr == 16000:
            assert bytes(r["bytes"]) == bytes(src_bytes)  # bit-identical
            assert r["n_samples"] == n_in
        else:
            exp = resample_to(AU.decode(src_bytes, "pcm16"), sr, 16000)
            assert r["n_samples"] == exp.size
            got = AU.decode(bytes(r["bytes"]), "pcm16")
            np.testing.assert_allclose(got, AU.decode(
                AU.encode(exp, "pcm16"), "pcm16"), atol=1e-6)
        assert r["dur_ms"] == r["n_samples"] * 1000 // 16000

    rw = out["cw"]
    inner, hdr_sr, off, plen = wav_payload_span(bytes(rw["bytes"]))
    assert (inner, hdr_sr) == ("ulaw", 16000)
    assert rw["n_samples"] == plen  # ulaw: 1 byte/sample
    assert rw["codec"] == "wav" and rw["sr_hz"] == 16000

    # the no-op path leaves dur_ms METADATA untouched too (a floor
    # recompute could silently decrement it on unchanged rows)
    odd = spark.createDataFrame(
        [("o", rows[1][1], "pcm16", 16000, 501)],
        "clip_id string, bytes binary, codec string, sr_hz int, dur_ms int")
    assert resample_clips(odd, 16000).collect()[0]["dur_ms"] == 501

    # header/column mismatch raises
    bad = spark.createDataFrame(
        [("b", wav_encode(ww, 8000, codec="ulaw"), "wav", 44100, 300)],
        "clip_id string, bytes binary, codec string, sr_hz int, dur_ms int")
    with pytest.raises(Exception, match="inconsistent rates"):
        resample_clips(bad, 16000).collect()
    with pytest.raises(ValueError, match="positive"):
        resample_clips(df, 0)
    with pytest.raises(ValueError, match="n_samples"):
        resample_clips(df.withColumn("n_samples", df.sr_hz), 16000)
