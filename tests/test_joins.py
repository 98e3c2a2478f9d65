"""asof_join / range_join / interval_overlap_join vs pandas and
brute-force references (pandas.merge_asof is the canonical as-of
semantics; DuckDB ASOF JOIN is the gate oracle)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jepl_spark.operators import joins as J

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", _ts(1), 100.0),
        ("A", _ts(5), 101.0),
        ("A", _ts(9), 102.0),
        ("B", _ts(2), 200.0),
        ("B", _ts(2), 201.0),  # duplicate left times both survive
        ("C", _ts(3), 300.0),  # key with no right rows
        ("A", None, 999.0),    # null time passes through unmatched
    ]
    return spark.createDataFrame(rows, "k string, t timestamp, px double")


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", _ts(0), 99.5, 1),
        ("A", _ts(5), 100.5, 2),   # equal timestamp must match backward
        ("A", _ts(7), 101.5, 3),
        ("B", _ts(4), 199.5, 4),   # after both B trades -> backward null
        ("A", None, -1.0, 5),      # null right time dropped
    ]
    return spark.createDataFrame(rows, "k string, t timestamp, bid double, qid int")


def _sortable(rows):
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def _collect(df, cols):
    return _sortable(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_backward_matches_merge_asof(spark, trades, quotes):
    out = J.asof_join(trades, quotes, on="k", left_time="t")
    got = _collect(out, ["k", "t", "px", "r_bid", "r_qid"])

    lt = trades.toPandas()
    rt = quotes.toPandas().dropna(subset=["t"])
    exp = pd.merge_asof(
        lt.dropna(subset=["t"]).sort_values("t"),
        rt.sort_values("t"),
        on="t",
        by="k",
        direction="backward",
        suffixes=("", "_r"),
    )
    want = _sortable(
        (
            r.k,
            r.t.to_pydatetime(),
            r.px,
            None if pd.isna(r.bid) else r.bid,
            None if pd.isna(r.qid) else int(r.qid),
        )
        for r in exp.itertuples()
    )
    # the null-time left row survives unmatched
    want.append(("A", None, 999.0, None, None))
    assert got == _sortable(want)


def test_asof_forward(spark, trades, quotes):
    out = J.asof_join(trades, quotes, on="k", left_time="t", direction="forward")
    got = {
        (r["k"], r["t"], r["px"]): r["r_qid"] for r in out.collect()
    }
    # A@1 -> quote@5 (qid 2), A@5 -> equal ts matches (qid 2),
    # A@9 -> nothing after, B@2 -> quote@4 (qid 4)
    assert got[("A", _ts(1), 100.0)] == 2
    assert got[("A", _ts(5), 101.0)] == 2
    assert got[("A", _ts(9), 102.0)] is None
    assert got[("B", _ts(2), 200.0)] == 4
    assert got[("C", _ts(3), 300.0)] is None


def test_asof_tolerance(spark, trades, quotes):
    out = J.asof_join(
        trades, quotes, on="k", left_time="t",
        tolerance=F.lit(2 * 60 * 1_000_000),  # 2 minutes in micros
    )
    got = {(r["k"], r["t"]): r["r_qid"] for r in out.collect()}
    assert got[("A", _ts(1))] == 1      # gap 1 min, kept
    assert got[("A", _ts(5))] == 2      # gap 0
    assert got[("A", _ts(9))] == 3      # gap 2 min, kept (<=)
    assert got[("B", _ts(2))] is None   # no earlier quote at all


def test_asof_right_tie_deterministic(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t bigint")
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "z"), (1, 5, "m")], "k int, t bigint, v string"
    )
    out = J.asof_join(left, right, on="k", left_time="t").collect()
    assert len(out) == 1 and out[0]["r_v"] == "z"  # max struct wins


def test_asof_no_keys_global(spark):
    left = spark.createDataFrame([(10,), (1,)], "t bigint")
    right = spark.createDataFrame([(5, "x"), (9, "y")], "t bigint, v string")
    got = {r["t"]: r["r_v"] for r in J.asof_join(left, right, None, "t").collect()}
    assert got == {10: "y", 1: None}


def _brute_range(points, intervals, keyed=True):
    out = []
    for iv in intervals:
        for p in points:
            if (not keyed or iv[0] == p[0]) and iv[1] <= p[1] <= iv[2]:
                out.append((iv[3], p[2]))
    return sorted(out)


def test_range_join_matches_brute_force(spark):
    intervals = [
        ("u1", 100, 250, "i1"),
        ("u1", 240, 300, "i2"),   # overlapping intervals both match
        ("u2", 0, 10_000, "i3"),  # long interval -> broadcast lane
        ("u1", 500, 400, "i4"),   # inverted -> dropped
    ]
    points = [
        ("u1", 100, "p1"),   # boundary inclusive (start)
        ("u1", 250, "p2"),   # in both i1, i2
        ("u1", 301, "p3"),   # outside
        ("u2", 9_999, "p4"),
        ("u3", 150, "p5"),   # key with no interval
    ]
    iv = spark.createDataFrame(intervals, "u string, s bigint, e bigint, iid string")
    pt = spark.createDataFrame(points, "u string, t bigint, pid string")
    out = J.range_join(
        pt, iv, point_time="t", start_col="s", end_col="e", on="u",
        bin_width=100, long_span_bins=50,
    )
    got = sorted((r["iid"], r["p_pid"]) for r in out.collect())
    assert got == _brute_range(points, intervals)


def test_range_join_timestamps(spark):
    iv = spark.createDataFrame(
        [("u1", _ts(0), _ts(60), "w1")], "u string, s timestamp, e timestamp, iid string"
    )
    pt = spark.createDataFrame(
        [("u1", _ts(30), "p1"), ("u1", _ts(61), "p2")],
        "u string, t timestamp, pid string",
    )
    out = J.range_join(pt, iv, "t", "s", "e", on="u", bin_width="15 minutes")
    assert [r["p_pid"] for r in out.collect()] == ["p1"]


def test_interval_overlap_join_exactly_once(spark):
    a_rows = [("u1", 0, 1000, "a1"), ("u1", 2000, 2100, "a2"), ("u2", 0, 50, "a3")]
    b_rows = [("u1", 900, 2050, "b1"), ("u1", 3000, 4000, "b2"), ("u2", 51, 60, "b3")]
    a = spark.createDataFrame(a_rows, "u string, s bigint, e bigint, aid string")
    b = spark.createDataFrame(b_rows, "u string, s bigint, e bigint, bid string")
    out = J.interval_overlap_join(
        a, b, "s", "e", "s", "e", on="u", bin_width=100
    )
    got = sorted((r["aid"], r["b_bid"]) for r in out.collect())
    # a1 x b1 overlap (shares many bins -> must appear ONCE);
    # a2 x b1 overlap; a3 x b3 touch? 50 < 51 -> no overlap (closed)
    assert got == [("a1", "b1"), ("a2", "b1")]


def test_parse_width(spark):
    assert J._parse_width_us("15 minutes") == 15 * 60 * 1_000_000
    assert J._parse_width_us("1 hour") == 3_600 * 1_000_000
    assert J._parse_width_us(7) == 7
    with pytest.raises(ValueError):
        J._parse_width_us("fortnight")
    with pytest.raises(ValueError):
        J._parse_width_us("0 hours")


def test_asof_rejects_bad_direction_and_clash(spark, trades, quotes):
    with pytest.raises(ValueError):
        J.asof_join(trades, quotes, on="k", left_time="t", direction="sideways")
    clash = trades.withColumnRenamed("px", "r_bid")
    with pytest.raises(ValueError):
        J.asof_join(clash, quotes, on="k", left_time="t")
