"""Parquet table loaders for the driver-generated test corpus."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: Reads at least this big get fanned out when the scan planned fewer
#: splits than half the cluster's cores (guide §2.5: one unsplittable
#: file serializes every downstream projection).  Reads BELOW the
#: floor keep their planned layout — small inputs gain nothing from a
#: shuffle, and the correctness gates (sf0.01/0.001) keep their
#: historical single-partition aggregation order bit-for-bit.
_SPLIT_MIN_BYTES = 2 << 20


def _input_bytes(path: str) -> int:
    """Total bytes under a LOCAL parquet path (file or directory).
    Non-local filesystems raise, and the caller skips the fan-out —
    at real cluster scale the scan splits by itself."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table, fanning the scan out to the cluster's
    parallelism when the planner produced too few splits for a
    non-trivial input (a 126 MB single file plans as ONE task under
    the default 128 MB ``spark.sql.files.maxPartitionBytes``, pinning
    every fused projection of every consumer to one core — measured
    as the dominant wall of the whole sf1.0 bench suite).  The
    repartition is a one-time shuffle of the raw rows, deterministic
    (keyless repartition sorts before binning), and scale-adaptive:
    inputs that already plan ≥ cores/2 splits — any real multi-file
    corpus — are untouched."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    try:
        size = _input_bytes(path)
    except OSError:
        size = 0
    par = spark.sparkContext.defaultParallelism
    if size >= _SPLIT_MIN_BYTES and df.rdd.getNumPartitions() < max(
        2, par // 2
    ):
        df = df.repartition(par)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
