"""Vectorized pandas/Arrow UDFs for the audio lane.

The ONLY Python on any hot path in this engine, as mandated by the
north rule ("audio payloads are decoded to PCM exclusively inside
vectorized pandas/Arrow UDFs — no per-row Python"):

- arrives as Arrow batches (spark.sql.execution.arrow.pyspark.enabled)
- numpy-vectorized G.711/PCM decode per batch (sources/audio.py)
- returns either scalar features (rms/peak/duration — the cheap path
  that avoids shipping PCM back to the JVM) or the full PCM array
  (tests / downstream feature extraction)

Image/video-style decode (resize, frame-sample) would follow the same
``mapInPandas`` shape; the decoders for those modalities are stubbed
(NotImplementedError) because the libraries are not in this container —
the Spark-side plumbing (schema, batching, partitioning) is identical.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from ..sources import audio


@F.pandas_udf(ArrayType(FloatType()))
def decode_pcm(b: pd.Series, codec: pd.Series) -> pd.Series:
    """bytes(codec) → float32 PCM array, one Arrow batch at a time."""
    out = []
    for blob, c in zip(b, codec):
        out.append(audio.decode(blob, c))
    return pd.Series(out)


_STATS_SCHEMA = StructType(
    [
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("n_samples", IntegerType()),
        StructField("clipping_ratio", DoubleType()),
    ]
)


@F.pandas_udf(_STATS_SCHEMA)
def pcm_stats(b: pd.Series, codec: pd.Series) -> pd.DataFrame:
    """Decode + reduce to scalar features inside the Python worker —
    PCM never crosses back to the JVM (bandwidth-optimal path)."""
    rms, peak, n, clip = [], [], [], []
    for blob, c in zip(b, codec):
        x = audio.decode(blob, c).astype(np.float64)
        if x.size == 0:
            rms.append(0.0); peak.append(0.0); n.append(0); clip.append(0.0)
            continue
        rms.append(float(np.sqrt(np.mean(x * x))))
        peak.append(float(np.max(np.abs(x))))
        n.append(int(x.size))
        clip.append(float(np.mean(np.abs(x) > 0.999)))
    return pd.DataFrame(
        {"rms": rms, "peak": peak, "n_samples": n, "clipping_ratio": clip}
    )


def with_decoded_pcm(df: DataFrame, out_col: str = "pcm") -> DataFrame:
    return df.withColumn(out_col, decode_pcm(F.col("bytes"), F.col("codec")))


def with_pcm_stats(df: DataFrame, out_col: str = "stats") -> DataFrame:
    return df.withColumn(out_col, pcm_stats(F.col("bytes"), F.col("codec")))


def resample_pcm(df: DataFrame, target_sr: int) -> DataFrame:
    """Decode + linear-resample to a common rate via mapInPandas —
    the shape a feature-extraction stage would use (PCM stays columnar
    through Arrow; per-batch numpy, no per-row Python)."""
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("pcm_rs", ArrayType(FloatType())),
            StructField("sr_rs", IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pcms = []
            for blob, c, sr in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"]):
                x = audio.decode(blob, c)
                if int(sr) == target_sr or x.size == 0:
                    pcms.append(x)
                else:
                    n_out = max(1, int(round(x.size * target_sr / int(sr))))
                    t_out = np.linspace(0.0, x.size - 1, n_out)
                    pcms.append(
                        np.interp(t_out, np.arange(x.size), x).astype(np.float32)
                    )
            pdf = pdf.copy()
            pdf["pcm_rs"] = pcms
            pdf["sr_rs"] = target_sr
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


_FULL_SCHEMA = StructType(
    [
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("n_samples", IntegerType()),
        StructField("clipping_ratio", DoubleType()),
        StructField("feat", ArrayType(FloatType())),
    ]
)


@F.pandas_udf(_FULL_SCHEMA)
def audio_features(b: pd.Series, codec: pd.Series) -> pd.DataFrame:
    """One-pass decode → stats + spectral features.  A single UDF so the
    audio bytes cross the JVM↔Arrow boundary exactly once; downstream
    operators (joins, windows) then carry only the small feature struct.
    At scale: ALWAYS reduce heavy payloads before stateful operators —
    stream-stream join state otherwise checkpoints the raw blobs."""
    win = np.hanning(512).astype(np.float32)
    edges = np.unique(
        np.round(np.logspace(0, np.log10(256), _N_MEL + 1)).astype(int)
    )
    rms, peak, n, clip, feats = [], [], [], [], []
    for blob, c in zip(b, codec):
        x = audio.decode(blob, c)
        if x.size == 0:
            rms.append(0.0); peak.append(0.0); n.append(0); clip.append(0.0)
            feats.append(np.zeros(2 * _N_MEL, dtype=np.float32))
            continue
        xd = x.astype(np.float64)
        rms.append(float(np.sqrt(np.mean(xd * xd))))
        peak.append(float(np.max(np.abs(xd))))
        n.append(int(x.size))
        clip.append(float(np.mean(np.abs(xd) > 0.999)))
        if x.size < 512:
            x = np.pad(x, (0, 512 - x.size))
        n_frames = 1 + (x.size - 512) // 256
        idx = np.arange(512)[None, :] + 256 * np.arange(n_frames)[:, None]
        frames = x[idx] * win
        power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        bands = np.add.reduceat(power, edges[:-1], axis=1)
        logb = np.log1p(bands)
        feats.append(
            np.concatenate([logb.mean(axis=0), logb.std(axis=0)]).astype(np.float32)
        )
    return pd.DataFrame(
        {"rms": rms, "peak": peak, "n_samples": n, "clipping_ratio": clip,
         "feat": feats}
    )


def with_audio_features(df: DataFrame, out_col: str = "af") -> DataFrame:
    return df.withColumn(out_col, audio_features(F.col("bytes"), F.col("codec")))


@F.pandas_udf(ArrayType(FloatType()))
def audio_features_heavy(b: pd.Series, codec: pd.Series) -> pd.Series:
    """Production-representative feature extraction (~10-15 ms/clip):
    multi-resolution spectrograms (256/512/1024 windows), 24 log bands
    each, plus an MFCC-like DCT over the 512-window bands — the class
    of per-clip work (VAD, MFCC, embedding prep) a real training
    pipeline runs.  Used by the compute-dominated scaling benchmark."""
    feats_out = []
    configs = [(256, 128), (512, 256), (1024, 512)]
    wins = {n: np.hanning(n).astype(np.float32) for n, _ in configs}
    edges = {
        n: np.unique(np.round(np.logspace(0, np.log10(n // 2), 25)).astype(int))
        for n, _ in configs
    }
    # DCT-II basis for 24 bands → 13 coefficients
    k = np.arange(13)[:, None]
    nb = np.arange(24)[None, :]
    dct = np.cos(np.pi * k * (2 * nb + 1) / (2 * 24)).astype(np.float64)
    for blob, c in zip(b, codec):
        x0 = audio.decode(blob, c)
        parts = []
        mel512 = None
        for n, hop in configs:
            x = x0 if x0.size >= n else np.pad(x0, (0, n - x0.size))
            n_frames = 1 + (x.size - n) // hop
            idx = np.arange(n)[None, :] + hop * np.arange(n_frames)[:, None]
            frames = x[idx] * wins[n]
            power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
            bands = np.add.reduceat(power, edges[n][:-1], axis=1)[:, :24]
            logb = np.log1p(bands)
            parts.append(logb.mean(axis=0))
            parts.append(logb.std(axis=0))
            if n == 512:
                mel512 = logb
        if mel512 is not None and mel512.shape[1] >= 24:
            mfcc = dct @ mel512.T.astype(np.float64)  # 13 × frames
            parts.append(mfcc.mean(axis=1))
            parts.append(mfcc.std(axis=1))
        feats_out.append(
            np.concatenate([p.astype(np.float32) for p in parts])
        )
    return pd.Series(feats_out)


_N_MEL = 16


@F.pandas_udf(ArrayType(FloatType()))
def spectral_features(b: pd.Series, codec: pd.Series) -> pd.Series:
    """Log-power band features (mel-like): decode → frame (512/256 hann)
    → |rFFT|² → 16 log-spaced band energies → log → per-band mean+std →
    32-dim vector.  The compute-heavy feature-extraction stage of a
    training-data pipeline, numpy-vectorized per Arrow batch."""
    win = np.hanning(512).astype(np.float32)
    # 16 log-spaced band edges over the 257 rfft bins
    edges = np.unique(
        np.round(np.logspace(0, np.log10(256), _N_MEL + 1)).astype(int)
    )
    out = []
    for blob, c in zip(b, codec):
        x = audio.decode(blob, c)
        if x.size < 512:
            x = np.pad(x, (0, 512 - x.size))
        n_frames = 1 + (x.size - 512) // 256
        idx = np.arange(512)[None, :] + 256 * np.arange(n_frames)[:, None]
        frames = x[idx] * win
        power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        bands = np.add.reduceat(power, edges[:-1], axis=1)
        logb = np.log1p(bands)
        feat = np.concatenate([logb.mean(axis=0), logb.std(axis=0)])
        out.append(feat.astype(np.float32))
    return pd.Series(out)


def with_spectral_features(df: DataFrame, out_col: str = "features") -> DataFrame:
    return df.withColumn(out_col, spectral_features(F.col("bytes"), F.col("codec")))


# -- multimodal stubs ----------------------------------------------------------


def decode_image_stub(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Image decode plumbing (STUB): the container has no image codecs.
    Raises NotImplementedError inside the worker if ever executed; the
    plan shape (mapInPandas, binary in → struct out) is the real one."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("width", IntegerType()), StructField("height", IntegerType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires an image codec library not present in "
            "this environment; plumbing is schema-complete"
        )
        yield  # pragma: no cover

    return df.mapInPandas(gen, schema=out_schema)
