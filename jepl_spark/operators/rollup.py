"""Hypertable-style multi-resolution rollup cascade.

Continuous-aggregate pattern (TimescaleDB hypertable rollups, Druid
compaction): aggregate raw events ONCE at the finest resolution, then
derive every coarser resolution from the next-finer rollup by algebraic
re-aggregation — count/sum add, min/max cascade, avg is re-derived as
sum/count at read time.  At 100 TB this is the difference between one
full-scan shuffle per resolution and one full-scan shuffle total: the
5-minute rollup of a day of events is ~10^4 rows per key, so the
hourly/daily levels re-shuffle only rollup rows (megabytes, not
terabytes).

The finest level is exactly the engine's windowed-aggregation lane, so
the same call works on a streaming DataFrame (add a watermark first);
coarser levels are batch re-aggregations of the stored finest table —
the standard "stream into the finest, cascade the rest on a schedule"
topology.

Correctness is gate-checked: the top of the cascade must equal a
direct aggregation of the raw table at that resolution (DuckDB twin).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KeyCols = Union[str, Sequence[str]]

_UNIT_S = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _duration_s(d: str) -> int:
    parts = d.strip().split()
    if len(parts) != 2:
        raise ValueError(f"duration {d!r}: expected '<n> <unit>'")
    n, unit = parts
    unit = unit.rstrip("s")
    if unit not in _UNIT_S:
        raise ValueError(f"duration {d!r}: unit must be one of {sorted(_UNIT_S)}")
    try:
        count = int(n)
    except ValueError:
        raise ValueError(f"duration {d!r}: count must be an integer") from None
    if count <= 0:
        raise ValueError(f"duration {d!r}: count must be positive")
    return count * _UNIT_S[unit]


from jepl_spark.operators.sketch import _groups as _keys  # shared normalizer


ROLLUP_COLS = ("n", "s", "mn", "mx")


def rollup_finest(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    duration: str,
    keys: Optional[KeyCols] = None,
) -> DataFrame:
    """The base of the cascade: one windowed aggregation over raw rows.
    Output: window_start, window_end, keys..., n (non-null count),
    s (sum), mn, mx.  Works on a streaming DataFrame too (watermark it
    first); aggregates ignore null values consistently, so avg := s/n.
    """
    ks = _keys(keys)
    w = F.window(F.col(ts_col), duration)
    v = F.col(value_col)
    return (
        df.groupBy(w.alias("__w"), *ks)
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("s"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *ks,
            *ROLLUP_COLS,
        )
    )


def rollup_coarser(
    fine: DataFrame,
    duration: str,
    keys: Optional[KeyCols] = None,
) -> DataFrame:
    """Re-aggregate a rollup (output of rollup_finest/rollup_coarser)
    to a coarser resolution — touches ONLY rollup rows, never raw data.
    ``duration`` must be a multiple of the finer level (checked against
    the window_start/window_end span of the input schema at runtime via
    the alignment filter below being total: misaligned fine windows
    would straddle coarse boundaries and silently split — rejected)."""
    ks = _keys(keys)
    w = F.window(F.col("window_start"), duration)
    out = (
        fine.groupBy(w.alias("__w"), *ks)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.max(F.col("window_end")).alias("__max_fine_end"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *ks,
            *ROLLUP_COLS,
            "__max_fine_end",
        )
    )
    # a fine window leaking past the coarse end means the levels don't
    # nest -> corrupt rollup; fail loudly instead of double-counting.
    # The guard is a FILTER (always-true unless it raises), not a
    # projected column — a projection would be silently removed by
    # column pruning whenever the guarded column isn't consumed
    bad = F.col("__max_fine_end") > F.col("window_end")
    out = out.where(
        F.when(
            bad,
            F.raise_error(F.lit(
                "rollup_coarser: finer windows straddle the coarser "
                "boundary — durations do not nest"
            )),
        ).otherwise(F.lit(True))
    )
    return out.drop("__max_fine_end")


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    levels: Sequence[str] = ("5 minutes", "1 hour"),
    keys: Optional[KeyCols] = None,
) -> dict[str, DataFrame]:
    """Full cascade: raw → levels[0] → levels[1] → … returning every
    resolution keyed by its duration string.  Levels must be strictly
    increasing and each must divide the next (epoch-aligned Spark
    windows then guarantee perfect nesting)."""
    if len(levels) < 1:
        raise ValueError("need at least one level")
    secs = [_duration_s(d) for d in levels]
    for a, b in zip(secs, secs[1:]):
        if b <= a or b % a != 0:
            raise ValueError(
                f"levels must be increasing and nest evenly; "
                f"{a}s does not divide {b}s"
            )
    out: dict[str, DataFrame] = {}
    cur = rollup_finest(df, ts_col, value_col, levels[0], keys=keys)
    out[levels[0]] = cur
    for d in levels[1:]:
        cur = rollup_coarser(cur, d, keys=keys)
        out[d] = cur
    return out


def with_avg(rollup: DataFrame) -> DataFrame:
    """avg re-derived from the algebraic state (null for empty n)."""
    return rollup.withColumn(
        "avg", F.when(F.col("n") > 0, F.col("s") / F.col("n"))
    )
