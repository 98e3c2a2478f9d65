"""KMV (k-minimum-values) distinct-count sketch.

A mergeable cardinality sketch built on a DETERMINISTIC hash (md5 →
first 60 bits), unlike ``approx_count_distinct``'s opaque HLL++: the
same input always yields the same sketch and estimate on any engine, so
the estimator is exactly replayable in the DuckDB oracle — a sketch
whose correctness is gate-checkable, not just statistically plausible.

Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
data stream"): with h uniform in [0, 2^60) and h_(k) the k-th smallest
distinct hash, E[distinct] ≈ (k-1) · 2^60 / h_(k); fewer than k
distinct hashes means the count is exact.  Relative error ≈ 1/sqrt(k).

Scale design: one exchange for the distinct on (group, hash) — longs
only, the value column never shuffles — then a two-stage k-min: a
partial window over (group, hash-salt) first cuts each group to
``partial_buckets``·k rows, so the final per-group sort ranks a bounded
set no matter how many distinct values a hot group holds (the same
partial-aggregate idea as map-side combine, expressed with windows).
Sketches are plain sorted ``array<long>`` columns: store them in
parquet per partition/day, merge with ``kmv_merge`` (array ops, no
re-scan of raw data), estimate with ``kmv_estimate``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DOMAIN = float(1 << 60)  # hashes are uniform in [0, 2^60)

GroupCols = Union[str, Sequence[str]]


def _groups(group_by: Optional[GroupCols]) -> list[str]:
    if group_by is None:
        return []
    if isinstance(group_by, str):
        return [group_by]
    return list(group_by)


def kmv_hash(col: Column) -> Column:
    """Deterministic 60-bit uniform hash: first 15 hex chars of md5.
    60 bits keeps the value inside a signed long on every engine
    (DuckDB replay: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    group_by: Optional[GroupCols] = None,
    partial_buckets: int = 32,
) -> DataFrame:
    """Per-group KMV sketch: sorted array of the k smallest distinct
    60-bit hashes of ``col`` (fewer if the group has < k distinct
    values).  Output: group columns + ``kmv`` array<long> + ``kmv_k``.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (estimator divides by h_(k))")
    groups = _groups(group_by)
    dh = df.select(*groups, kmv_hash(F.col(col)).alias("__h")).distinct()

    if partial_buckets > 1:
        # stage 1: k smallest per (group, salt) — bounds the final
        # window's input to partial_buckets * k rows per group
        salt = F.pmod(F.col("__h"), F.lit(partial_buckets))
        w1 = Window.partitionBy(*groups, salt).orderBy("__h")
        dh = dh.withColumn("__rn", F.row_number().over(w1)).where(
            F.col("__rn") <= k
        ).drop("__rn")

    w = Window.partitionBy(*groups).orderBy("__h")
    kept = dh.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    return (
        kept.groupBy(*groups)
        .agg(F.sort_array(F.collect_list("__h")).alias("kmv"))
        .withColumn("kmv_k", F.lit(k))
    )


def kmv_merge(
    sketches: DataFrame,
    group_by: Optional[GroupCols] = None,
    kmv_col: str = "kmv",
) -> DataFrame:
    """Merge sketches to coarser groups (or one global row).  KMV
    merges losslessly: union the hash sets, keep the k smallest — the
    result is IDENTICAL to sketching the union of the raw inputs.
    ``k`` is taken from the inputs (must agree)."""
    groups = _groups(group_by)
    merged = (
        sketches.groupBy(*groups)
        .agg(
            F.flatten(F.collect_list(kmv_col)).alias("__all"),
            F.min("kmv_k").alias("__kmin"),
            F.max("kmv_k").alias("kmv_k"),
        )
    )
    # slice(k) of the distinct-sorted union; arrays are <= n_inputs * k
    merged = merged.withColumn(
        "kmv",
        F.slice(F.array_sort(F.array_distinct("__all")), 1, F.col("kmv_k")),
    )
    bad = F.col("__kmin") != F.col("kmv_k")
    merged = merged.withColumn(
        "kmv",
        F.when(bad, F.raise_error(F.lit("kmv_merge: mixed k values")))
        .otherwise(F.col("kmv")),
    )
    return merged.drop("__all", "__kmin")


def kmv_estimate(kmv_col: Column, k_col: Column) -> Column:
    """Distinct-count estimate from a sketch array: exact when the
    group had fewer than k distinct values, else (k-1)·2^60/h_(k)."""
    m = F.size(kmv_col)
    hk = F.element_at(kmv_col, k_col.cast("int"))
    return F.when(m < k_col, m.cast("double")).otherwise(
        (k_col.cast("double") - 1.0) * F.lit(_DOMAIN) / hk.cast("double")
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 256,
    group_by: Optional[GroupCols] = None,
    partial_buckets: int = 32,
) -> DataFrame:
    """End-to-end: group columns + ``est_distinct`` (double)."""
    sk = kmv_sketch(df, col, k=k, group_by=group_by,
                    partial_buckets=partial_buckets)
    groups = _groups(group_by)
    return sk.select(
        *groups,
        kmv_estimate(F.col("kmv"), F.col("kmv_k")).alias("est_distinct"),
    )
