"""Streaming golden-fixture harness + oracle.

Fixtures pin: input file order (one parquet file per micro-batch via
maxFilesPerTrigger=1, mtime-ordered), event times, watermark delay, and
window spec.  Expected output rows are computed by a Python simulation
of Spark's append-mode watermark semantics layered on the reference
interpreter (jepl_spark.oracle.eval_sql):

Empirically pinned Spark semantics (probed on 4.1, see test_streaming):
- the LATE-ROW FILTER at batch i uses the watermark computed from
  batches ≤ i-2 (one extra batch of grace vs the progress-reported
  watermark): drop iff window_end ≤ that value
- EVICTION/EMISSION at batch i uses the watermark from batches ≤ i-1;
  availableNow runs a trailing empty batch, so the final emission
  horizon is (global max event time − delay)
- fixtures append far-future sentinel batches to flush real windows
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta, timezone
from typing import Any, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from jepl_spark.lang.parser import parse_statement
from jepl_spark.oracle import eval_sql

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


def ts(seconds: float) -> datetime:
    return BASE + timedelta(seconds=seconds)


def write_batches(src_dir: str, batches: list[list[dict]], schema: pa.schema) -> None:
    """One parquet file per batch, mtimes strictly increasing so the
    file stream source processes them in order."""
    os.makedirs(src_dir, exist_ok=True)
    t0 = time.time() - len(batches) - 10
    for i, docs in enumerate(batches):
        cols = {f.name: [d.get(f.name) for d in docs] for f in schema}
        table = pa.Table.from_pydict(cols, schema=schema)
        path = os.path.join(src_dir, f"{i:05d}.parquet")
        pq.write_table(table, path)
        os.utime(path, (t0 + i, t0 + i))


def simulate_append_output(
    sql: str,
    batches: list[list[dict]],
    *,
    ts_field: str,
    window_s: float,
    delay_s: float,
    slide_s: Optional[float] = None,
) -> dict[tuple, list[float]]:
    """Expected append-mode rows: {(window_start_epoch, oracle_group_key):
    [field values]} for every window closed by the final watermark."""
    slide = slide_s or window_s

    def rel(t) -> float:
        return (t - BASE).total_seconds() if hasattr(t, "tzinfo") else float(t)

    def windows_of(t: float) -> list[float]:
        # window starts s (multiples of slide) with s <= t < s + window
        starts = []
        s = (t // slide) * slide
        while s > t - window_s:
            starts.append(s)
            s -= slide
        return starts

    # running max event time AFTER each batch; filter at batch i uses
    # the max through batch i-2 (empirically pinned, see module docs)
    maxes: list[float] = []
    survivors: dict[float, list[dict]] = {}  # window_start → docs
    for i, batch in enumerate(batches):
        wm_filter = (
            maxes[i - 2] - delay_s if i >= 2 else float("-inf")
        )
        for d in batch:
            t = rel(d[ts_field])
            for ws in windows_of(t):
                wend = ws + window_s
                if wend <= wm_filter:
                    continue  # late: window already finalized
                survivors.setdefault(ws, []).append(d)
        batch_max = max((rel(d[ts_field]) for d in batch), default=float("-inf"))
        maxes.append(max(batch_max, maxes[-1] if maxes else float("-inf")))

    final_wm = (maxes[-1] - delay_s) if maxes else float("-inf")
    stmt = parse_statement(sql)
    _ = stmt
    out: dict[tuple, list[float]] = {}
    for ws, docs in survivors.items():
        if ws + window_s <= final_wm:
            # strip the ts field: JEPL rules see only the payload
            payload = [{k: v for k, v in d.items() if k != ts_field} for d in docs]
            pm = eval_sql(sql, payload)
            for key, vals in pm.items():
                out[(ws, key)] = vals
    return out
