"""Grouped distribution statistics (percentiles).

Two lanes, one contract:

- ``grouped_percentiles`` — EXACT linear-interpolation percentiles
  (Spark's ``percentile``, the same formula as ANSI
  ``percentile_cont`` / DuckDB ``quantile_cont``, so results are
  oracle-replayable bit for bit).  Exact percentile materializes each
  group's values; it is the right tool when per-group cardinality is
  bounded (dashboard dimensions, per-key SLO reports), wrong for
  billion-row groups.
- ``approx_grouped_percentiles`` — ``percentile_approx`` (Greenwald-
  Khanna sketch, JVM-side, mergeable, bounded memory ``O(accuracy)``
  per group): the 100 TB path.  Error ≤ 1/accuracy in RANK (not value);
  results are deterministic for a fixed partitioning but not an
  engine-replayable formula, so the gate pins the exact lane and a test
  pins approx-vs-exact rank error instead.

Both: one partially-aggregated exchange on the group keys.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jepl_spark.operators.sketch import _groups

GroupCols = Union[str, Sequence[str]]


def _names(percentiles: Sequence[float]) -> list[str]:
    out = []
    for p in percentiles:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile must be in [0, 1], got {p}")
        # 0.5 -> p50, 0.95 -> p95, 0.999 -> p99_9
        s = f"{p * 100:.10g}".replace(".", "_")
        out.append(f"p{s}")
    return out


def grouped_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95, 0.99),
    group_by: Optional[GroupCols] = None,
) -> DataFrame:
    """Exact linear-interpolation percentiles per group; columns named
    p50, p95, p99_9, …"""
    groups = _groups(group_by)
    aggs = [
        F.expr(f"percentile({value_col}, {p!r})").alias(n)
        for p, n in zip(percentiles, _names(percentiles))
    ]
    return df.groupBy(*groups).agg(*aggs)


def approx_grouped_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95, 0.99),
    group_by: Optional[GroupCols] = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles per group (rank error
    ≤ 1/accuracy) — constant memory per group at any scale."""
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    groups = _groups(group_by)
    names = _names(percentiles)
    arr = "array(" + ", ".join(repr(p) for p in percentiles) + ")"
    agg = F.expr(
        f"percentile_approx({value_col}, {arr}, {accuracy})"
    ).alias("__ps")
    out = df.groupBy(*groups).agg(agg)
    return out.select(
        *groups,
        *[F.element_at(F.col("__ps"), i + 1).alias(n) for i, n in enumerate(names)],
    )


def grouped_topk(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    group_by: Optional[GroupCols] = None,
    weight_col: Optional[str] = None,
    partial_buckets: int = 32,
) -> DataFrame:
    """Exact heavy hitters: the k most frequent values of ``key_col``
    per group (weighted by ``weight_col`` if given), with a
    deterministic total order (count desc, key asc) so the k-boundary
    never depends on partitioning.  The exact counterpart of the
    Count-Min estimate lane (sketch.cms_lookup): use this when the
    distinct-key set per group is boundable, the sketch when it is not.

    Shape: one partially-aggregated exchange on (group, key), then a
    two-stage rank (the deterministic_reservoir partial k-min
    pattern): a first window over (group, key-hash salt) cuts every
    group to at most ``partial_buckets``·k rows — any global top-k row
    is also top-k within its salt bucket (pigeonhole), so the cut is
    lossless — before the final per-group window, which therefore
    never funnels a hot group's full distinct-key set through one
    task."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if key_col in ("rank", "cnt"):
        raise ValueError(
            f"key_col {key_col!r} collides with an output column name"
        )
    groups = _groups(group_by)
    w = F.sum(weight_col) if weight_col else F.count("*")
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(*groups, key_col)
        .agg(w.alias("cnt"))
    )
    return _ranked_topk(counts, groups, key_col, k, partial_buckets)


def _ranked_topk(
    counts: DataFrame,
    groups: Sequence[str],
    key_col: str,
    k: int,
    partial_buckets: int = 32,
) -> DataFrame:
    """Shared rank core of grouped_topk / stream_windowed_topk: the
    lossless salted pre-cut (any global top-k row is top-k within its
    key-hash salt bucket — pigeonhole) followed by the final per-group
    rank, which therefore sees at most ``partial_buckets``·k rows per
    group instead of the group's full distinct-key set.  Input must be
    a ``(groups…, key_col, cnt)`` counts frame."""
    from pyspark.sql.window import Window

    order = [F.col("cnt").desc(), F.col(key_col).asc()]
    if partial_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(key_col)), F.lit(partial_buckets))
        w1 = Window.partitionBy(*groups, salt).orderBy(*order)
        counts = (
            counts.withColumn("__prk", F.row_number().over(w1))
            .where(F.col("__prk") <= k)
            .drop("__prk")
        )
    win = Window.partitionBy(*groups).orderBy(*order)
    return (
        counts.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/groupBy key: the
    ``top`` heaviest keys with their row counts and share of the total
    — the number that decides whether a key needs salting or an AQE
    skew-join hint before a 100 TB shuffle.  One aggregation on the
    key; totals ride a tiny cross-joined single-row frame (no second
    scan — ReuseExchange dedups the shared groupBy — and no driver
    round-trip in the plan)."""
    if key_col in ("rank", "cnt", "share", "skew_factor"):
        raise ValueError(
            f"key_col {key_col!r} collides with an output column name"
        )
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").alias("__total"),
        F.count("*").alias("__distinct"),
    )
    from pyspark.sql.window import Window

    # TakeOrderedAndProject (per-partition k-heap + driver merge) picks
    # the ``top`` survivors — never a global sort or a single-partition
    # shuffle of every distinct key, which is exactly the funnel this
    # diagnostic exists to detect.  The rank window then runs over the
    # <= top surviving rows only.
    order = [F.col("cnt").desc(), F.col(key_col).asc()]
    heavy = counts.orderBy(*order).limit(top)
    win = Window.orderBy(*order)
    heavy = heavy.withColumn("rank", F.row_number().over(win))
    # divide BEFORE multiplying by the distinct count: cnt·distinct as
    # int64 overflows (ANSI exception) at ~10^12 rows × 10^9 keys —
    # exactly the scale this diagnostic exists for
    share = F.col("cnt") / F.col("__total")
    return heavy.crossJoin(F.broadcast(totals)).select(
        "rank",
        key_col,
        "cnt",
        share.alias("share"),
        (share * F.col("__distinct")).alias(
            "skew_factor"  # 1.0 = perfectly uniform
        ),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_by: Optional[Union[str, Sequence[str]]] = None,
    k: float = 3.5,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Median/MAD outlier flagging — the data-cleaning filter that
    survives the outliers themselves (mean/stddev z-scores move WITH
    the contamination; the median and the median absolute deviation
    don't).  A row is flagged when |x − median| > k · MAD of its
    group (k=3.5 ≈ the classic Iglewicz-Hoaglin cut for the modified
    z-score).  NULL values are never flagged (no evidence); a
    zero-MAD group (over half its values identical) flags exactly the
    rows that differ from the median at all.

    Shape: one exact-percentile aggregation per group for the median,
    a second for the MAD (the deviation needs the median first), each
    a single exchange on the group key; thresholds join back null-safe
    on the group key (a NULL group is a real group — plain equality
    would leave its rows with NULL thresholds and a NULL flag that
    silently drops under a boolean filter).  For unbounded group
    cardinality swap in percentile_approx the same way
    grouped_percentiles documents."""
    for c in ("__med", "__dev", "__mad", flag_col):
        if c in df.columns:
            raise ValueError(
                f"input column {c!r} collides with an output/helper "
                f"column name"
            )
    groups = list(_groups(group_by))
    v = F.col(value_col).cast("double")

    def _join_back(left, right):
        # null-safe equi-join on the group key; the right side's key
        # columns are renamed so nothing shadows the caller's
        renamed = right.select(
            *[F.col(g).alias(f"__g_{g}") for g in groups],
            *[c for c in right.columns if c not in groups],
        )
        cond = None
        for g in groups:
            c = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
            cond = c if cond is None else (cond & c)
        return left.join(renamed, cond, "left").drop(
            *[f"__g_{g}" for g in groups]
        )

    # F.percentile over the Column (never f-string SQL interpolation):
    # a name needing backticks ('a-b', 'my value') must behave like
    # the F.col-based deviation path below, not parse as an expression
    med_agg = F.percentile(v, F.lit(0.5)).alias("__med")
    if groups:
        with_med = _join_back(df, df.groupBy(*groups).agg(med_agg))
    else:
        with_med = df.crossJoin(F.broadcast(df.agg(med_agg)))
    devs = with_med.withColumn("__dev", F.abs(v - F.col("__med")))
    mad_agg = F.percentile(F.col("__dev"), F.lit(0.5)).alias("__mad")
    if groups:
        full = _join_back(devs, devs.groupBy(*groups).agg(mad_agg))
    else:
        full = devs.crossJoin(F.broadcast(devs.agg(mad_agg)))
    flagged = F.when(v.isNull(), F.lit(False)).otherwise(
        F.col("__dev") > F.lit(float(k)) * F.col("__mad")
    )
    return full.withColumn(flag_col, flagged).drop("__med", "__dev", "__mad")


def stream_windowed_topk(
    stream: DataFrame,
    key_col: str,
    sink,
    ts_col: str = "ts",
    duration: str = "6 hours",
    k: int = 5,
    watermark: str = "1 hour",
    partial_buckets: int = 32,
):
    """Streaming per-window top-k — the "trending keys" lane: the k
    heaviest keys of every event-time window, emitted once when the
    watermark closes the window, committed exactly-once.  Returns
    ``(windowed_counts, foreach_batch)``; wire the counts frame
    through ``writeStream.outputMode("append")
    .foreachBatch(foreach_batch)``.

    APPEND MODE IS REQUIRED, and the callback enforces it: the
    per-batch rank is only total-per-window because append mode emits
    ALL of a window's count rows in the single micro-batch where the
    watermark passes the window end.  Under update mode a window's
    partial counts re-emit across batches and a rank over them would
    commit wrong top-k rows — so ``foreach_batch`` tracks the newest
    window already committed and RAISES when a batch carries a window
    at or before it (closed windows strictly ascend batch-over-batch
    in append mode; a repeat is the update-mode signature).  The guard
    is driver-side, O(1) state, and resets on restart (harmless: the
    exactly-once sink already makes replays idempotent).

    Why this composition: a rank over a streaming windowed aggregate
    cannot ride the streaming plan itself (window functions over a
    streaming aggregation are unsupported), and it does not need to —
    see above.  Ties break (count desc, key asc), matching
    ``grouped_topk``.

    Scale shape: the windowed count is the only stateful stage (state
    = live windows × distinct keys, watermark-evicted; map-side
    partial aggregation absorbs hot keys); the rank runs on emitted
    count rows only, THROUGH grouped_topk's lossless salted pre-cut
    (``partial_buckets``) — a closing window's full distinct-key set
    (~the user population for the trending use case) never funnels
    through one task; the final rank sees ≤ partial_buckets·k rows
    per window.  NULL keys carry no identity and are excluded
    (matching key_skew_report / grouped_topk)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = (
        stream.withWatermark(ts_col, watermark)
        .where(F.col(key_col).isNotNull())
        .groupBy(
            F.window(F.col(ts_col), duration).alias("__w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("__w.start").alias("window_start"), F.col(key_col), "cnt"
        )
    )

    newest_committed: list = [None]  # driver-side append-mode guard

    def foreach_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.persist()  # guard agg + rank: one execution
        try:
            hi_lo = batch.agg(
                F.max("window_start").alias("hi"),
                F.min("window_start").alias("lo"),
            ).first()
            if hi_lo["lo"] is not None:
                prev = newest_committed[0]
                if prev is not None and hi_lo["lo"] <= prev:
                    raise RuntimeError(
                        "stream_windowed_topk requires append output "
                        f"mode: batch {batch_id} re-emitted window "
                        f"{hi_lo['lo']} at or before the newest "
                        f"committed window {prev} — in append mode "
                        "closed windows strictly ascend, so this "
                        "stream is wired with update/complete mode "
                        "and a per-batch rank would commit partial "
                        "top-k rows"
                    )
            ranked = _ranked_topk(
                batch, ["window_start"], key_col, k, partial_buckets
            )
            sink.write_batch(ranked, batch_id)
            if hi_lo["lo"] is not None:
                newest_committed[0] = hi_lo["hi"]
        finally:
            batch.unpersist()

    return counts, foreach_batch


# -- fixed-bin histogram sketch ------------------------------------------------


def _hist_bin(value_col: str, bin_width: float):
    return F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("long")


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    bin_width: float,
    group_by: Optional[GroupCols] = None,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` per group: one row per
    non-empty bin, ``bin = floor(value / bin_width)``, with its count.
    The third distribution sketch next to KMV and CMS — and unlike the
    Greenwald-Khanna percentile_approx sketch, the row form is
    TRIVIALLY mergeable (sum counts by bin: daily → weekly → monthly
    rollups, or shard → global) and exactly replayable by the SQL
    oracle, at the cost of a caller-chosen VALUE-error bound
    (≤ bin_width) instead of a rank-error bound.

    NULL and NaN values carry no bin and are excluded (count them
    upstream if the distinction matters).  Negative values bin
    correctly (floor, not truncation).

    Scale shape: one partially-aggregated exchange on
    (group, bin) — hot bins absorb map-side; state/output is bounded
    by value-range / bin_width per group, independent of row count."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    keys = _groups(group_by)
    v = F.col(value_col)
    return (
        df.where(v.isNotNull() & ~F.isnan(v.cast("double")))
        .groupBy(*keys, _hist_bin(value_col, bin_width).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_merge(
    hists: DataFrame,
    group_by: Optional[GroupCols] = None,
) -> DataFrame:
    """Merge histogram-sketch rows (same bin_width!) across shards /
    windows / days: sum counts by (group, bin)."""
    keys = _groups(group_by)
    return hists.groupBy(*keys, "bin").agg(F.sum("n").alias("n"))


def histogram_percentiles(
    hist: DataFrame,
    percentiles: Sequence[float],
    bin_width: float,
    group_by: Optional[GroupCols] = None,
) -> DataFrame:
    """Percentile estimates from histogram-sketch rows: for each group
    and each p, the UPPER EDGE ``(bin + 1) · bin_width`` of the first
    bin (ascending) whose cumulative count reaches ``ceil(p · total)``
    — a deterministic, engine-replayable rule with value error
    ≤ bin_width (the true p-quantile lies inside the chosen bin; its
    upper edge is never below it and overshoots by less than one bin).

    Output: group keys + (p double, est double), one row per (group,
    p).  Percentiles must lie in (0, 1].

    Scale shape: cumulative sum by a window over bins WITHIN each
    group — safe precisely because the sketch bounded the per-group
    row count to value-range / bin_width (this is a sketch
    post-processor, never pointed at raw rows); then an explode of the
    literal percentile list and a min-bin aggregation.  No data×data
    join; cost is |groups| × bins."""
    from pyspark.sql.window import Window

    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    ps = sorted(set(float(p) for p in percentiles))
    if not ps or any(not (0.0 < p <= 1.0) for p in ps):
        raise ValueError(
            f"percentiles must be non-empty and each in (0, 1], got "
            f"{percentiles}"
        )
    keys = _groups(group_by)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bin") \
        if keys else Window.orderBy("bin")
    cum = hist.select(
        *keys, "bin", "n",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__cum"),
        F.sum("n").over(
            Window.partitionBy(*[F.col(k) for k in keys]) if keys
            else Window.partitionBy()
        ).alias("__total"),
    )
    p_arr = F.explode(
        F.array(*[F.lit(p) for p in ps])
    ).alias("p")
    return (
        cum.select(*keys, "bin", "__cum", "__total", p_arr)
        .where(
            F.col("__cum") >= F.ceil(F.col("p") * F.col("__total"))
        )
        .groupBy(*keys, "p")
        .agg(
            ((F.min("bin") + 1) * F.lit(float(bin_width))).alias("est")
        )
    )


def stream_windowed_histogram(
    stream: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "10 minutes",
    bin_width: float = 1.0,
    group_by: Optional[GroupCols] = None,
) -> DataFrame:
    """Streaming per-window histogram sketch: event-time windowed
    (group, bin) counts, emitted once per window when the watermark
    closes it (append mode) — streaming VALUE-DISTRIBUTION monitoring
    (latency percentiles per window, score drift) with state bounded
    by live-windows × groups × bins, never by row count.

    Returns the windowed counts frame (window_start, window_end,
    group keys, bin, n) ready for ``writeStream.outputMode("append")``
    + the exactly-once sink; run ``histogram_percentiles`` (grouping
    by window_start + the group keys) over the committed rows — or in
    a foreachBatch — for per-window percentile estimates, and
    ``histogram_merge`` to roll windows up to coarser horizons.

    NULL/NaN values are excluded (the batch-sketch contract)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    keys = _groups(group_by)
    v = F.col(value_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .where(v.isNotNull() & ~F.isnan(v.cast("double")))
        .groupBy(
            F.window(F.col(ts_col), duration).alias("__w"),
            *[F.col(k) for k in keys],
            _hist_bin(value_col, bin_width).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *keys, "bin", "n",
        )
    )
