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
    # guard expressed as a FILTER, not a withColumn on 'kmv': column
    # pruning would silently drop a column-attached raise_error when a
    # caller consumes only kmv_k / row counts (same hazard fixed for
    # cms_merge and rollup_coarser)
    bad = F.col("__kmin") != F.col("kmv_k")
    merged = merged.where(
        F.when(bad, F.raise_error(F.lit("kmv_merge: mixed k values")))
        .otherwise(F.lit(True))
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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications")
#
# Same deterministic-hash philosophy as KMV: rows (group, d, bucket,
# cnt) with bucket = md5-derived-60-bit(f"{d}:{value}") mod width, so
# the sketch — and every point estimate — is a pure function of the
# data, replayable on any engine (the DuckDB oracle rebuilds it from
# raw rows and must match hash-for-hash).
#
# Scale shape: building is one map-side explode (×depth, longs only —
# the value column itself never shuffles, only its hash) into one
# partially-aggregated groupBy on (group, d, bucket): output cardinality
# is bounded by depth·width per group regardless of input size.  The
# row-based layout (not a w×d array) is what keeps it mergeable with a
# plain sum and lets Spark's map-side combine collapse the explode
# before the exchange.  CMS error is one-sided: est ≥ true count,
# est ≤ true + ε·N with probability 1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.


def cms_bucket(col: Column, d_idx: Column, width: int) -> Column:
    """Row-d bucket of a value: 60-bit md5 hash of 'd:value' mod width.
    DuckDB replay: CAST(('0x' || substr(md5(d || ':' || v), 1, 15))
    AS BIGINT) % width.  NULL-propagating (F.concat): a NULL value gets
    a NULL bucket, matching the SQL replay, instead of every NULL
    colliding on md5('<d>')."""
    h = kmv_hash(
        F.concat(d_idx.cast("string"), F.lit(":"), col.cast("string"))
    )
    return F.pmod(h, F.lit(width))


def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
    group_by: Optional[GroupCols] = None,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Build the sketch: rows (group..., d, bucket, cnt).  ``weight_col``
    generalizes from counts to weighted sums (e.g. bytes per key).
    NULL values are excluded — a NULL is not a countable key."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2 and depth >= 1, got {width}x{depth}")
    groups = _groups(group_by)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    rows = df.where(F.col(col).isNotNull()).select(
        *groups,
        F.explode(
            F.array(*[F.lit(d) for d in range(depth)])
        ).alias("d"),
        F.col(col).alias("__v"),
        w.alias("__w"),
    ).select(
        *groups,
        "d",
        cms_bucket(F.col("__v"), F.col("d"), width).alias("bucket"),
        "__w",
    )
    return (
        rows.groupBy(*groups, "d", "bucket")
        .agg(F.sum("__w").alias("cnt"))
        .withColumn("cms_width", F.lit(width))
        .withColumn("cms_depth", F.lit(depth))
    )


def cms_merge(
    sketches: DataFrame,
    group_by: Optional[GroupCols] = None,
) -> DataFrame:
    """Merge sketches to coarser groups (or one global sketch): CMS
    counters are sums, so merge = re-sum per (d, bucket).  The result
    is IDENTICAL to sketching the union of the raw inputs.  width and
    depth are carried through and must agree across ALL input rows of
    an output group — checked over the whole group, not per bucket
    (sparse sketches with different shapes may share no bucket at all),
    and enforced with a FILTER so column pruning cannot drop it."""
    groups = _groups(group_by)
    # global (per output group) shape check, bucket-independent
    meta = sketches.groupBy(*groups).agg(
        F.min("cms_width").alias("__wmin"),
        F.max("cms_width").alias("cms_width"),
        F.min("cms_depth").alias("__dmin"),
        F.max("cms_depth").alias("cms_depth"),
    )
    bad = (F.col("__wmin") != F.col("cms_width")) | (
        F.col("__dmin") != F.col("cms_depth")
    )
    meta = meta.where(
        F.when(bad, F.raise_error(F.lit("cms_merge: mixed width/depth")))
        .otherwise(F.lit(True))
    ).drop("__wmin", "__dmin")
    merged = sketches.groupBy(*groups, "d", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    if groups:
        return merged.join(meta, on=groups)
    return merged.crossJoin(meta)


def cms_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    query_col: str,
    width: int,
    depth: int,
    group_by: Optional[GroupCols] = None,
) -> DataFrame:
    """Point estimates for a set of query values: min over the depth
    rows of the queried buckets (an absent bucket is a true zero).
    Output: group columns + query column + ``est`` (long, ≥ the true
    count/weight).  The query side explodes ×depth and joins on
    (group, d, bucket) — with a stored bucket-partitioned sketch this
    is a broadcast of the (small) query set, never a corpus scan."""
    groups = _groups(group_by)
    q = queries.select(
        *groups,
        F.col(query_col),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    ).withColumn("bucket", cms_bucket(F.col(query_col), F.col("d"), width))
    joined = q.join(
        sketch.select(*groups, "d", "bucket", "cnt"),
        on=[*groups, "d", "bucket"],
        how="left",
    ).fillna({"cnt": 0})
    return joined.groupBy(*groups, query_col).agg(F.min("cnt").alias("est"))


def cms_sketch_windowed(
    df: DataFrame,
    col: str,
    ts_col: str,
    duration: str,
    width: int = 2048,
    depth: int = 4,
    watermark: str | None = None,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Per-time-window CMS: rows (window_start, window_end, d, bucket,
    cnt) — the streaming telemetry shape ("top talkers per hour" at
    cardinalities where exact per-key counting cannot hold state).
    Works identically on batch and streaming input; on a stream pass
    ``watermark`` and the groupBy becomes a standard watermarked
    windowed aggregation (append mode emits each window's finished
    sketch exactly once through the sink).  Window sketches merge to
    coarser windows/global with ``cms_merge`` — counters are sums."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2 and depth >= 1, got {width}x{depth}")
    src = df.where(F.col(col).isNotNull())
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    rows = src.select(
        F.window(F.col(ts_col), duration).alias("__w"),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
        F.col(col).alias("__v"),
        w.alias("__w8"),
    ).select(
        "__w",
        "d",
        cms_bucket(F.col("__v"), F.col("d"), width).alias("bucket"),
        "__w8",
    )
    return (
        rows.groupBy("__w", "d", "bucket")
        .agg(F.sum("__w8").alias("cnt"))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "d",
            "bucket",
            "cnt",
        )
        .withColumn("cms_width", F.lit(width))
        .withColumn("cms_depth", F.lit(depth))
    )


def kmv_sketch_windowed_stateful(
    df: DataFrame,
    col: str,
    ts_col: str,
    duration: str,
    k: int = 256,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming per-time-window KMV distinct sketch with BOUNDED
    state: per tumbling window the k smallest distinct hashes are
    maintained in ``applyInPandasWithState`` state (≤ k longs per live
    window — the batch operator's rank windows cannot run on a stream,
    and a ``collect_set`` aggregation would hold the FULL distinct set
    per window), emitted exactly once as (window_start, kmv, kmv_k)
    when the event-time timeout fires after the watermark passes the
    window end.  Emitted rows merge losslessly across windows with
    ``kmv_merge`` and estimate with ``kmv_estimate`` — identical
    semantics to the batch sketch on the same rows.

    Scale shape: hashes are computed JVM-side before the stateful
    exchange (only (window, hash) longs shuffle); state per key is k
    longs regardless of the window's true cardinality; total state is
    bounded by k × live windows (watermark-evicted)."""
    if k < 2:
        raise ValueError("k must be >= 2 (estimator divides by h_(k))")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, LongType, StructField, StructType, TimestampType,
    )

    from jepl_spark.streaming.windows import ensure_event_timestamp

    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    df = ensure_event_timestamp(df, ts_col)
    wdf = (
        df.where(F.col(col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), duration).alias("__w"),
            kmv_hash(F.col(col)).alias("__h"),
        )
    )
    out_schema = StructType(
        [
            StructField("window_start", TimestampType()),
            StructField("kmv", ArrayType(LongType())),
            StructField("kmv_k", LongType()),
        ]
    )
    state_schema = StructType([StructField("mins", ArrayType(LongType()))])

    def update(key: tuple, pdfs, state: "GroupState"):
        import pandas as pd

        window = key[0]  # struct key arrives as {'start': ..., 'end': ...}
        wstart, wend = window["start"], window["end"]
        if state.hasTimedOut:
            (mins,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"window_start": [wstart], "kmv": [list(mins)], "kmv_k": [k]}
            )
            return
        cur = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            if len(pdf):
                cur.update(int(h) for h in pdf["__h"].tolist())
        state.update((sorted(cur)[:k],))
        from jepl_spark.streaming.state import timeout_epoch_ms

        state.setTimeoutTimestamp(timeout_epoch_ms(wend, session_tz))
        return
        yield  # pragma: no cover

    return wdf.groupBy("__w").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
