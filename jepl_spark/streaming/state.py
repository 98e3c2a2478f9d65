"""Custom stateful windowed aggregation via applyInPandasWithState.

The flatMapGroupsWithState-style lane named by the north rule: per
(window_start, dims…) key, a mutable accumulator (count/sum/min/max —
the reference's aggregate set, eval.go:307-365) held in the state store,
emitted exactly once when the event-time timeout fires after the
watermark passes the window end.

Built-in windowed aggregation (windows.py) is the preferred path —
Spark's HashAggregate + state store is faster than Python state — but
this operator is the extension point for semantics Spark cannot express
natively (e.g. conditional emission, cross-window carryover, custom
eviction), so it is implemented and golden-tested against the built-in.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("sum", DoubleType()),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
    ]
)


def timeout_epoch_ms(wend, session_tz: str) -> int:
    """Window-end naive timestamp (expressed in the SESSION timezone,
    which is how struct keys reach the Python worker) → epoch ms for
    ``setTimeoutTimestamp``.  Shared by every stateful windowed
    operator so the conversion cannot drift.  DST hardening: on a
    fall-back transition the naive wall time is ambiguous —
    ``ambiguous=True`` resolves to the DST side and
    ``nonexistent='shift_forward'`` handles spring-forward gaps, so
    the query never crashes mid-stream (the timeout can land an hour
    early during the one ambiguous hour a year in a non-UTC session
    zone; run pipelines in UTC to avoid even that)."""
    wend_ts = pd.Timestamp(wend)
    if wend_ts.tzinfo is None:
        wend_ts = wend_ts.tz_localize(
            session_tz, ambiguous=True, nonexistent="shift_forward"
        )
    return int(wend_ts.timestamp() * 1000)


def _out_schema(dims: list[str]) -> StructType:
    return StructType(
        [StructField("window_start", TimestampType())]
        + [StructField(d, StringType()) for d in dims]
        + [
            StructField("cnt", LongType()),
            StructField("sum", DoubleType()),
            StructField("avg", DoubleType()),
            StructField("min", DoubleType()),
            StructField("max", DoubleType()),
        ]
    )


def stateful_windowed_agg(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    window_duration: str,
    dims: Optional[list[str]] = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Incremental count/sum/avg/min/max per (tumbling window, dims)
    with state timeout at the window end (event-time semantics).

    Aggregate semantics are the REFERENCE's, not SQL's (eval.go:307-365
    / SURVEY §2.9): count counts rows (null value included), sum skips
    nulls, avg = sum / row-count, and min/max treat a null value as 0.0
    on a counted row — so state never needs a null sentinel.

    Emission: when the event-time timeout fires (watermark passed the
    window end) the accumulated row is emitted once and state removed —
    append-mode semantics equivalent to the built-in compiled path.
    """
    dims = dims or []
    # Timestamps reach the Python worker as naive datetimes in the
    # SESSION timezone; converting them to epoch ms for
    # setTimeoutTimestamp must localize with that zone, not assume UTC.
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    from .windows import ensure_event_timestamp

    df = ensure_event_timestamp(df, ts_col)
    # NB: the window struct column keeps the watermark tag — extracting
    # .start would lose it and event-time timeout would be rejected.
    wdf = df.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), window_duration).alias("__w"),
        *[F.col(d).cast("string").alias(d) for d in dims],
        F.col(value_col).cast("double").alias("__v"),
    )

    out_schema = _out_schema(dims)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        window = key[0]  # struct key arrives as a dict {'start','end'}
        wstart, wend = window["start"], window["end"]
        if state.hasTimedOut:
            cnt, s, mn, mx = state.get
            state.remove()
            row: dict[str, Any] = {"window_start": [wstart]}
            for i, d in enumerate(dims):
                row[d] = [key[1 + i]]
            row.update(
                cnt=[cnt],
                sum=[s],
                avg=[(s / cnt) if cnt else 0.0],
                min=[mn if cnt else 0.0],
                max=[mx if cnt else 0.0],
            )
            yield pd.DataFrame(row)
            return

        cnt, s, mn, mx = (state.get if state.exists else (0, 0.0, None, None))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            vals = pdf["__v"]
            cnt += int(len(pdf))
            s += float(vals.dropna().sum())
            # reference semantics: a null value on a counted row
            # contributes 0.0 to min/max (eval.go:326-358)
            filled = vals.fillna(0.0)
            vmn, vmx = float(filled.min()), float(filled.max())
            mn = vmn if mn is None else min(mn, vmn)
            mx = vmx if mx is None else max(mx, vmx)
        state.update((cnt, s, mn if mn is not None else 0.0, mx if mx is not None else 0.0))
        # fire once the watermark passes the window end
        state.setTimeoutTimestamp(timeout_epoch_ms(wend, session_tz))
        return
        yield  # pragma: no cover

    return wdf.groupBy("__w", *dims).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
