"""Deterministic generator for the audio clip + transcript table.

Exact shape per BASELINE.json ``input_hint``:
(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
 transcript string) + event_time added for streaming fixtures
(FIXTURES.md F4).

Generation is distributed: ``spark.range(n)`` → ``mapInPandas`` with
vectorized numpy synthesis per Arrow batch — no driver-side loop, so the
same generator scales from 100 test clips to the bench corpus.  Skews
are intentional (codec 80/15/5, Zipf-ish clip popularity in the event
stream) to exercise AQE/salting paths.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from . import audio

CLIP_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("sr_hz", IntegerType(), False),
        StructField("dur_ms", IntegerType(), False),
        StructField("codec", StringType(), False),
        StructField("transcript", StringType(), False),
        StructField("event_time", TimestampType(), False),
        StructField("seq", LongType(), False),
    ]
)

_SRS = (8000, 16000, 44100)
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()

BASE_TS = pd.Timestamp("2024-01-01 00:00:00")


def clip_row(i: int, step_s: float = 1.0, late_every: int = 0) -> dict:
    """Pure-python single clip (used by tests and the oracle)."""
    sr = _SRS[i % 3]
    dur = 200 + (i * 37) % 1801
    codec = audio.CODECS[0 if (i % 20) < 16 else (1 if (i % 20) < 19 else 2)]
    wave = audio.synth_wave(i, sr, dur)
    # integer microseconds: float seconds accumulate sub-microsecond
    # residue that trips Arrow's safe ns->us conversion at large i
    us = int(round(i * step_s * 1_000_000))
    if late_every and i % late_every == late_every - 1:
        us -= int(round(30 * step_s * 1_000_000))  # controlled late arrival
    ts = BASE_TS + pd.Timedelta(microseconds=us)
    return {
        "clip_id": f"clip-{i:012d}",
        "bytes": audio.encode(wave, codec),
        "sr_hz": sr,
        "dur_ms": dur,
        "codec": codec,
        "transcript": f"transcript {i} {_WORDS[i % len(_WORDS)]}",
        "event_time": ts,
        "seq": i,
    }


def clips_df(
    spark: SparkSession,
    n: int,
    step_s: float = 1.0,
    late_every: int = 0,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed clips table: one row per i ∈ [0, n)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [clip_row(int(i), step_s, late_every) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng = spark.range(n, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=CLIP_SCHEMA)


def transcripts_df(
    spark: SparkSession,
    n: int,
    step_s: float = 1.0,
    delay_s: float = 5.0,
    partitions: Optional[int] = None,
) -> DataFrame:
    """The transcript stream for the stream-stream join: the
    (clip_id, transcript, event_time) projection delivered with a
    bounded event-time offset (FIXTURES.md F4).

    Generated directly from the closed-form fields — synthesizing and
    discarding the audio (clip_row) would double corpus-generation cost
    for no benefit."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = [int(i) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "clip_id": [f"clip-{i:012d}" for i in idx],
                    "transcript": [
                        f"transcript {i} {_WORDS[i % len(_WORDS)]}" for i in idx
                    ],
                    "event_time": [
                        BASE_TS
                        + pd.Timedelta(
                            microseconds=int(round((i * step_s + delay_s) * 1_000_000))
                        )
                        for i in idx
                    ],
                    "seq": idx,
                }
            )

    schema = StructType(
        [
            StructField("clip_id", StringType(), False),
            StructField("transcript", StringType(), False),
            StructField("event_time", TimestampType(), False),
            StructField("seq", LongType(), False),
        ]
    )
    rng = spark.range(
        n, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInPandas(gen, schema=schema)


def zipf_clip_events(
    spark: SparkSession,
    n_events: int,
    n_clips: int,
    s: float = 1.2,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Event stream referencing clips with Zipf-skewed popularity —
    clip_id 0 is the hot key.  Used for skew-handling tests/benches."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Zipf CDF computed once per partition, not per Arrow batch
        ranks = np.arange(1, n_clips + 1, dtype=np.float64) ** (-s)
        cdf = np.cumsum(ranks) / np.sum(ranks)
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            # deterministic per-event uniform from a hash, then inverse-CDF
            h = (idx * 2654435761 % 2**32) / 2**32
            clip_idx = np.searchsorted(cdf, h)
            yield pd.DataFrame(
                {
                    "event_seq": idx,
                    "clip_id": [f"clip-{int(c):012d}" for c in clip_idx],
                    "event_time": BASE_TS + pd.to_timedelta(idx, unit="s"),
                }
            )

    schema = StructType(
        [
            StructField("event_seq", LongType(), False),
            StructField("clip_id", StringType(), False),
            StructField("event_time", TimestampType(), False),
        ]
    )
    rng = spark.range(
        n_events, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInPandas(gen, schema=schema)


def dup_clip_row(
    i: int,
    every: int = 7,
    offset: int = 3,
    gain: float = 0.9,
    step_s: float = 1.0,
) -> dict:
    """Clip row with PLANTED near-duplicates: every ``every``-th clip
    (i %% every == offset, i > 0) is a re-gained, pcm16-re-encoded copy
    of clip i-1's recording — same sample rate and duration (the
    blocking keys a regain/transcode copy preserves), its own clip_id /
    transcript / event_time.  The expected near-dup pair set is
    closed-form: {(clip-(i-1), clip-i) : i %% every == offset}, which
    is what the correctness gate's SQL oracle rebuilds."""
    row = clip_row(i, step_s=step_s)
    if i > 0 and i % every == offset:
        src = clip_row(i - 1, step_s=step_s)
        wave = audio.decode(src["bytes"], src["codec"]) * gain
        row["bytes"] = audio.encode(wave.astype(np.float32), "pcm16")
        row["codec"] = "pcm16"
        row["sr_hz"] = src["sr_hz"]
        row["dur_ms"] = src["dur_ms"]
    return row


def planted_dup_clips(
    spark: SparkSession,
    n: int,
    every: int = 7,
    offset: int = 3,
    gain: float = 0.9,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed clips table with planted audio near-duplicates
    (dup_clip_row) — the fixture for audio_near_dups / audio_dedup
    gates and tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [dup_clip_row(int(i), every, offset, gain) for i in pdf["id"]]
            )

    rng = spark.range(
        n, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInPandas(gen, schema=CLIP_SCHEMA)


def degraded_clip_row(
    i: int,
    clip_every: int = 11,
    clip_offset: int = 4,
    silent_every: int = 13,
    silent_offset: int = 6,
    step_s: float = 1.0,
) -> dict:
    """Clip row with PLANTED quality defects for the admission gate:
    every (i %% clip_every == clip_offset) clip re-encodes its wave at
    4x gain (the codecs clamp at the rails -> heavy clipping, ratio
    >= ~0.3 vs the natural 0.0 — synth amplitude caps at 0.9), and
    every (i %% silent_every == silent_offset) clip at 0.002x gain
    (whole clip below the -40 dBFS silence floor -> silence_ratio 1.0
    vs the natural <~0.05).  When both trigger, clipping wins — the
    same precedence admit_clips applies.  The defect set is
    closed-form in clip_id, which is what the gate's SQL oracle
    rebuilds."""
    row = clip_row(i, step_s=step_s)
    wave = audio.synth_wave(i, row["sr_hz"], row["dur_ms"])
    if i % clip_every == clip_offset:
        row["bytes"] = audio.encode(
            np.clip(wave * 4.0, -1.0, 1.0).astype(np.float32), row["codec"]
        )
    elif i % silent_every == silent_offset:
        row["bytes"] = audio.encode(
            (wave * 0.002).astype(np.float32), row["codec"]
        )
    return row


def degraded_clips(
    spark: SparkSession,
    n: int,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed clips table with planted clipping/silence defects
    (degraded_clip_row) — the fixture for the audio admission gate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [degraded_clip_row(int(i)) for i in pdf["id"]]
            )

    rng = spark.range(
        n, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInPandas(gen, schema=CLIP_SCHEMA)


def xrate_dup_clip_row(
    i: int,
    every: int = 7,
    offset: int = 3,
    copy_sr: int = 8000,
    gain: float = 0.9,
    step_s: float = 1.0,
) -> dict:
    """Clip row with PLANTED cross-sample-rate near-duplicates: every
    ``every``-th clip (i %% every == offset, i > 0) is clip i-1's
    recording linear-RESAMPLED to ``copy_sr`` (the 8 kHz ↔ 16 kHz
    transcode re-upload class), re-gained, and pcm16-re-encoded — the
    wall-clock duration (dur_ms) is preserved, the sample rate and
    sample count change, so the same-sr blocking key of the plain lane
    can never catch it.  Expected pair set is closed-form:
    {(clip-(i-1), clip-i) : i %% every == offset} — the gate's SQL
    oracle rebuilds it."""
    from jepl_spark.functions.audio_udfs import resample_to

    row = clip_row(i, step_s=step_s)
    if i > 0 and i % every == offset:
        src = clip_row(i - 1, step_s=step_s)
        wave = audio.decode(src["bytes"], src["codec"])
        wave = resample_to(wave, src["sr_hz"], copy_sr) * gain
        row["bytes"] = audio.encode(wave.astype(np.float32), "pcm16")
        row["codec"] = "pcm16"
        row["sr_hz"] = copy_sr
        row["dur_ms"] = src["dur_ms"]
    return row


def xrate_dup_clips(
    spark: SparkSession,
    n: int,
    every: int = 7,
    offset: int = 3,
    copy_sr: int = 8000,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed clips table with planted CROSS-RATE near-duplicates
    (xrate_dup_clip_row) — the fixture for the canonical-rate audio
    near-dup gate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    xrate_dup_clip_row(int(i), every, offset, copy_sr)
                    for i in pdf["id"]
                ]
            )

    rng = spark.range(
        n, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInPandas(gen, schema=CLIP_SCHEMA)


def trim_dup_clip_row(
    i: int,
    every: int = 7,
    offset: int = 3,
    sr: int = 8000,
    step_s: float = 1.0,
) -> dict:
    """LONG clip row (5-8 s — the offset-tolerant lane needs clips
    longer than its anchor window) with PLANTED lead/tail-TRIMMED
    near-duplicates: every ``every``-th clip (i %% every == offset,
    i > 0) is clip i-1's recording with 0.3-1.5 s cut from the FRONT
    (odd i) or the BACK (even i), regained, and pcm16-re-encoded —
    duration changes by the trim, so the duration-exact lanes can
    never catch it.  dur_ms is derived from the surviving sample
    count.  Expected pair set is closed-form:
    {(clip-(i-1), clip-i) : i %% every == offset}."""
    row = clip_row(i, step_s=step_s)
    dur = 5000 + (i * 137) % 3001
    row["codec"] = "pcm16"
    row["sr_hz"] = sr
    if i > 0 and i % every == offset:
        src_dur = 5000 + ((i - 1) * 137) % 3001
        wave = audio.synth_wave(i - 1, sr, src_dur)
        trim = int((0.3 + (i % 13) * 0.1) * sr)
        cut = wave[trim:] if i % 2 == 1 else wave[:-trim]
        row["bytes"] = audio.encode(
            (cut * 0.9).astype(np.float32), "pcm16"
        )
        row["dur_ms"] = cut.size * 1000 // sr
    else:
        row["bytes"] = audio.encode(audio.synth_wave(i, sr, dur), "pcm16")
        row["dur_ms"] = dur
    return row


def trim_dup_clips(
    spark: SparkSession,
    n: int,
    every: int = 7,
    offset: int = 3,
    sr: int = 8000,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed long-clip table with planted TRIMMED near-duplicates
    (trim_dup_clip_row) — the fixture for the offset-tolerant audio
    near-dup gate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    trim_dup_clip_row(int(i), every, offset, sr)
                    for i in pdf["id"]
                ]
            )

    rng = spark.range(
        n, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInPandas(gen, schema=CLIP_SCHEMA)
