"""Rollup cascade: every level must equal a direct aggregation of the
raw table at that resolution."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jepl_spark.operators import rollup as R

T0 = dt.datetime(2024, 3, 1)


@pytest.fixture(scope="module")
def raw(spark):
    rows = []
    for i in range(500):
        rows.append(
            (
                T0 + dt.timedelta(seconds=37 * i),
                "k" + str(i % 3),
                float((i * 7) % 101) - 20.0,
            )
        )
    rows.append((T0, "k0", None))  # null value: not counted, not summed
    return spark.createDataFrame(rows, "ts timestamp, k string, v double")


def _direct(spark, raw, duration, keys):
    return R.rollup_finest(raw, "ts", "v", duration, keys=keys)


def _as_map(df, keys):
    out = {}
    for r in df.collect():
        kk = (r["window_start"],) + tuple(r[k] for k in keys)
        out[kk] = (r["n"], r["s"], r["mn"], r["mx"])
    return out


@pytest.mark.parametrize("keys", [[], ["k"]])
def test_cascade_equals_direct(spark, raw, keys):
    cascade = R.rollup_cascade(
        raw, "ts", "v", levels=("1 minute", "5 minutes", "1 hour"), keys=keys
    )
    for lvl in ("1 minute", "5 minutes", "1 hour"):
        got = _as_map(cascade[lvl], keys)
        want = _as_map(_direct(spark, raw, lvl, keys), keys)
        assert set(got) == set(want)
        for kk in want:
            gn, gs, gmn, gmx = got[kk]
            wn, ws, wmn, wmx = want[kk]
            assert (gn, gmn, gmx) == (wn, wmn, wmx)
            assert gs == pytest.approx(ws, rel=1e-12)


def test_avg_and_null_handling(spark, raw):
    lvl = R.rollup_cascade(raw, "ts", "v", levels=("1 hour",), keys=["k"])
    av = R.with_avg(lvl["1 hour"])
    for r in av.collect():
        assert r["avg"] == pytest.approx(r["s"] / r["n"])


def test_bad_levels_rejected(spark, raw):
    with pytest.raises(ValueError):
        R.rollup_cascade(raw, "ts", "v", levels=("5 minutes", "7 minutes"))
    with pytest.raises(ValueError):
        R.rollup_cascade(raw, "ts", "v", levels=("1 hour", "5 minutes"))
    with pytest.raises(ValueError):
        R.rollup_cascade(raw, "ts", "v", levels=())
    with pytest.raises(ValueError):
        R._duration_s("3 fortnights")


def test_straddle_guard_fires(spark):
    # hand-build a "fine" rollup whose windows do NOT nest into 1 hour
    rows = [
        (dt.datetime(2024, 3, 1, 0, 45), dt.datetime(2024, 3, 1, 1, 30), 1, 1.0, 1.0, 1.0),
    ]
    fine = spark.createDataFrame(
        rows, "window_start timestamp, window_end timestamp, n bigint, s double, mn double, mx double"
    )
    with pytest.raises(Exception) as ei:
        R.rollup_coarser(fine, "1 hour").collect()
    assert "straddle" in str(ei.value)


def test_coarser_never_scans_raw(spark, raw):
    """The coarse plan reads the fine rollup only — its physical plan
    must not contain a second aggregate over 500 raw rows (proxy: the
    coarse level aggregates exactly the fine level's row count)."""
    cascade = R.rollup_cascade(raw, "ts", "v", levels=("1 minute", "1 hour"))
    n_fine = cascade["1 minute"].count()
    plan = cascade["1 hour"]._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate over the fine Aggregate; raw LocalRelation appears once
    assert plan.count("LocalRelation") <= 1
    assert n_fine > cascade["1 hour"].count()


def test_nesting_guard_survives_column_pruning(spark):
    """The straddle guard is a filter, so it fires even when the
    consumer prunes every guarded column (e.g. bare count())."""
    from pyspark.sql import functions as F

    from jepl_spark.operators import rollup as R

    ev = spark.createDataFrame(
        # epoch-aligned 7-min window of 00:58 is [00:57, 01:04) — it
        # straddles the hour boundary
        [("2024-01-01 00:58:00", 1.0)], ["ts", "v"]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
    fine = R.rollup_finest(ev, "ts", "v", "7 minutes")
    bad = R.rollup_coarser(fine, "1 hour")
    with pytest.raises(Exception, match="do not nest"):
        bad.select("window_start").count()


def test_duration_error_messages(spark):
    from jepl_spark.operators import rollup as R

    with pytest.raises(ValueError, match="count must be positive"):
        R._duration_s("0 minutes")
    with pytest.raises(ValueError, match="count must be an integer"):
        R._duration_s("x minutes")
    with pytest.raises(ValueError, match="unit must be one of"):
        R._duration_s("5 fortnights")
