"""Temporal join operators Spark lacks natively: as-of join and range
(interval) join.

The reference engine has no joins at all (eval.go:19-25 evaluates one
rule over one document stream); these are the brief-mandated custom
operators for the training-data pipeline ("as-of join, range join"),
implemented as compositions of built-in DataFrame ops — no Python UDFs,
no driver-side loops.

Scale design:

- ``asof_join``: the union + last-non-null-over-window trick.  Both
  sides shuffle ONCE on the key (exactly a sort-merge join's exchange),
  sort within partitions by time, and a running ``last(ignorenulls)``
  carries the most recent right-side payload onto each left row.  Cost
  is O(n log n) per partition with no candidate blowup — unlike the
  naive range-predicate join, which Spark plans as a broadcast/loop
  join with per-pair filtering.  Caveat: a single hot key serializes
  into one window partition; for known-skewed keys, range-partition
  the time axis per key and run per-slab with a carried boundary row.

- ``range_join`` / ``interval_overlap_join``: equi-join on
  fixed-width time bins, the standard trick for making Catalyst use a
  shuffled hash/sort-merge join instead of a nested-loop join for
  interval predicates.  Intervals explode to the bins they cover
  (choose ``bin_width`` ≈ p95 interval length: explosion factor stays
  ~2 while bins stay selective); points map to exactly one bin, so
  point-in-interval pairs are found exactly once with NO dedup
  shuffle.  For interval×interval overlap, a pair would surface in
  every shared bin — the first-shared-bin predicate
  (``bin == max(floor(a_start/w), floor(b_start/w))``) emits it
  exactly once, again dedup-free.  Degenerate long intervals (span >
  ``long_span_bins`` bins) would explode; they are routed to a
  broadcast nested-loop lane instead (few by assumption — if most
  intervals are long, raise ``bin_width``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OnCols = Union[str, Sequence[str]]

_US_PER_SEC = 1_000_000


def _keys(on: Optional[OnCols]) -> list[str]:
    if on is None:
        return []
    if isinstance(on, str):
        return [on]
    return list(on)


def _time_as_long(df: DataFrame, col: str) -> Column:
    """Normalize a time axis to a sortable/binnable long: timestamps
    become epoch microseconds, integral columns pass through."""
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt.startswith("timestamp"):
        # parquet reads land as timestamp_ntz; unix_micros wants tz'd.
        # The cast is identity under a UTC session timezone (which the
        # engine pins); any consistent monotone mapping preserves
        # as-of/range semantics regardless.
        if dt == "timestamp_ntz":
            c = c.cast("timestamp")
        return F.unix_micros(c)
    if dt in ("bigint", "int", "smallint", "tinyint", "long"):
        return c.cast("long")
    raise ValueError(
        f"asof/range join time column {col!r} has type {dt}; "
        "expected timestamp or integral"
    )


# -- as-of join ---------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Optional[OnCols],
    left_time: str,
    right_time: Optional[str] = None,
    direction: str = "backward",
    tolerance: Optional[Column] = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: for every left row, attach the single right row
    with the greatest ``right_time`` <= ``left_time`` (``backward``) or
    the smallest ``right_time`` >= ``left_time`` (``forward``) within
    the same key group — pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics, including the tie rule that an exactly-equal timestamp
    matches.  Unmatched left rows survive with nulls (left join).

    ``tolerance``: optional max time gap as a Column literal in the
    time axis's units (microseconds for timestamp columns); matches
    further away are nulled out, the left row still survives.

    Right rows with a null ``right_time`` can never match and are
    dropped; left rows with a null ``left_time`` pass through
    unmatched.

    Right-side ties (duplicate (key, time)): one row wins
    deterministically — the max by Spark struct ordering of the
    payload.  Pre-aggregate the right side if you need a different
    rule.

    Plan shape: union both sides → one hash exchange on the key → sort
    within partitions by (time, side) → running ``last(ignorenulls)``.
    No nested-loop join, no candidate explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _keys(on)
    rt = right_time or left_time

    right_payload = [c for c in right.columns if c not in keys]
    out_payload = [right_prefix + c for c in right_payload]
    clash = [c for c in out_payload if c in left.columns]
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {clash}")

    l_t = _time_as_long(left, left_time)
    r_t = _time_as_long(right, rt)

    # Right side: one struct column so a genuinely-NULL right value
    # cannot make last(ignorenulls) skip to an OLDER row for that one
    # column (the struct itself is non-null per right row).
    r_struct = F.struct(*[F.col(c) for c in right_payload]).alias("__r")
    r_rows = (
        right.where(F.col(rt).isNotNull())
        .select(*keys, r_t.alias("__t"), r_struct)
        .withColumn("__side", F.lit(0))
    )
    l_rows = left.select(
        *keys,
        l_t.alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )

    both = r_rows.unionByName(
        l_rows.where(F.col("__t").isNotNull()), allowMissingColumns=True
    )

    # Tie rules, all inside ONE window sort (no extra dedup exchange):
    # right rows sort before left rows at an equal timestamp (so t'==t
    # matches), and duplicate right (key, time) rows sort payload-ASC
    # so the running last() deterministically picks the max payload.
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc(), F.col("__r").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__side").asc(), F.col("__r").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    ).withColumn("__mt", F.last(F.when(F.col("__side") == 0, F.col("__t")),
                                ignorenulls=True).over(w))

    out = matched.where(F.col("__side") == 1)
    if tolerance is not None:
        gap = F.abs(F.col("__t") - F.col("__mt"))
        out = out.withColumn(
            "__m", F.when(gap <= tolerance, F.col("__m"))
        ).withColumn("__mt", F.when(gap <= tolerance, F.col("__mt")))

    cols = [F.col(f"__l.`{c}`").alias(c) for c in left.columns] + [
        F.col(f"__m.`{c}`").alias(right_prefix + c) for c in right_payload
    ]
    result = out.select(*cols)
    # left rows with a null time axis pass through unmatched (kept
    # declarative — no driver-side emptiness probe)
    rtypes = dict(right.dtypes)
    pad = left.where(F.col(left_time).isNull()).select(
        "*",
        *[
            F.lit(None).cast(rtypes[c]).alias(right_prefix + c)
            for c in right_payload
        ],
    )
    return result.unionByName(pad)


# -- range join ---------------------------------------------------------------


def _bins(lo: Column, hi: Column, width_us: int) -> Column:
    return F.sequence(
        F.floor(lo / width_us).cast("long"), F.floor(hi / width_us).cast("long")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start_col: str,
    end_col: str,
    on: Optional[OnCols] = None,
    bin_width: str = "1 hour",
    long_span_bins: int = 256,
    point_prefix: str = "p_",
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair where
    ``start <= t <= end`` (closed bounds) and the key columns match.
    Returns interval columns + prefixed point columns.

    Plan shape: intervals explode to covered fixed-width bins, points
    map to exactly ONE bin, equi-join on (keys..., bin) — a shuffled
    hash join Catalyst can size with AQE, never a nested-loop join.
    Each qualifying pair is produced exactly once (the point lives in
    one bin), so there is no dedup shuffle.  Intervals spanning more
    than ``long_span_bins`` bins are routed to a broadcast
    nested-loop lane instead of exploding.
    """
    keys = _keys(on)
    width_us = _parse_width_us(bin_width)

    p_t = _time_as_long(points, point_time)
    i_s = _time_as_long(intervals, start_col)
    i_e = _time_as_long(intervals, end_col)

    p_payload = [c for c in points.columns if c not in keys]
    clash = [point_prefix + c for c in p_payload if point_prefix + c in intervals.columns]
    if clash:
        raise ValueError(f"prefixed point columns collide with intervals: {clash}")

    p = points.select(
        *keys,
        p_t.alias("__pt"),
        F.floor(p_t / width_us).cast("long").alias("__bin"),
        *[F.col(c).alias(point_prefix + c) for c in p_payload],
    ).where(F.col("__pt").isNotNull())

    iv = intervals.withColumn("__s", i_s).withColumn("__e", i_e).where(
        F.col("__s").isNotNull() & F.col("__e").isNotNull() & (F.col("__s") <= F.col("__e"))
    )
    span_bins = (F.floor(F.col("__e") / width_us) - F.floor(F.col("__s") / width_us))

    short = iv.where(span_bins < long_span_bins).withColumn(
        "__bin", F.explode(_bins(F.col("__s"), F.col("__e"), width_us))
    )
    cond = (F.col("__pt") >= F.col("__s")) & (F.col("__pt") <= F.col("__e"))
    out = short.join(p, on=keys + ["__bin"], how="inner").where(cond).drop("__bin")

    # degenerate long intervals: broadcast the points against the (few,
    # by assumption) long intervals instead of exploding their bins —
    # kept declarative, no emptiness probe; an empty lane unions free
    long_iv = iv.where(span_bins >= long_span_bins)
    pb = p.drop("__bin")
    for k in keys:
        pb = pb.withColumnRenamed(k, "__pk_" + k)
    jcond = (pb["__pt"] >= long_iv["__s"]) & (pb["__pt"] <= long_iv["__e"])
    for k in keys:
        jcond = jcond & (pb["__pk_" + k] == long_iv[k])
    long_out = F.broadcast(long_iv).join(pb, on=jcond, how="inner").drop(
        *["__pk_" + k for k in keys]
    )
    out = out.unionByName(long_out)
    return out.drop("__s", "__e", "__pt")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    on: Optional[OnCols] = None,
    bin_width: str = "1 hour",
    b_prefix: str = "b_",
) -> DataFrame:
    """Interval-overlap join: every (a, b) pair whose closed intervals
    intersect (``a_start <= b_end AND b_start <= a_end``) with matching
    keys.  Both sides explode to covered bins; a pair shares up to
    min(spans) bins, so the first-shared-bin predicate
    ``bin == greatest(floor(a_start/w), floor(b_start/w))`` emits each
    pair exactly once — no distinct shuffle.
    """
    keys = _keys(on)
    width_us = _parse_width_us(bin_width)

    a_s, a_e = _time_as_long(a, a_start), _time_as_long(a, a_end)
    b_s, b_e = _time_as_long(b, b_start), _time_as_long(b, b_end)

    b_payload = [c for c in b.columns if c not in keys]
    clash = [b_prefix + c for c in b_payload if b_prefix + c in a.columns]
    if clash:
        raise ValueError(f"prefixed b columns collide with a: {clash}")

    ax = (
        a.withColumn("__as", a_s)
        .withColumn("__ae", a_e)
        .where(F.col("__as").isNotNull() & (F.col("__as") <= F.col("__ae")))
        .withColumn("__bin", F.explode(_bins(F.col("__as"), F.col("__ae"), width_us)))
    )
    bx = (
        b.select(
            *keys,
            b_s.alias("__bs"),
            b_e.alias("__be"),
            *[F.col(c).alias(b_prefix + c) for c in b_payload],
        )
        .where(F.col("__bs").isNotNull() & (F.col("__bs") <= F.col("__be")))
        .withColumn("__bin", F.explode(_bins(F.col("__bs"), F.col("__be"), width_us)))
    )
    overlap = (F.col("__as") <= F.col("__be")) & (F.col("__bs") <= F.col("__ae"))
    first_shared = F.col("__bin") == F.greatest(
        F.floor(F.col("__as") / width_us).cast("long"),
        F.floor(F.col("__bs") / width_us).cast("long"),
    )
    out = ax.join(bx, on=keys + ["__bin"], how="inner").where(overlap & first_shared)
    return out.drop("__bin", "__as", "__ae", "__bs", "__be")


_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": _US_PER_SEC,
    "minute": 60 * _US_PER_SEC,
    "hour": 3600 * _US_PER_SEC,
    "day": 86400 * _US_PER_SEC,
}


def _parse_width_us(width: Union[str, int]) -> int:
    """'15 minutes' → microseconds; ints pass through as raw units
    (for integral time axes)."""
    if isinstance(width, int):
        if width <= 0:
            raise ValueError("bin_width must be positive")
        return width
    parts = width.strip().split()
    if len(parts) != 2:
        raise ValueError(f"bin_width {width!r}: expected '<n> <unit>'")
    n, unit = parts
    unit = unit.rstrip("s")
    if unit not in _UNIT_US or int(n) <= 0:
        raise ValueError(f"bin_width {width!r}: unit must be one of {sorted(_UNIT_US)}")
    return int(n) * _UNIT_US[unit]
