"""Percentile operators: exact values vs a numpy reference; approx
within documented rank error of exact."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jepl_spark.operators import stats as ST


@pytest.fixture(scope="module")
def vals(spark):
    # two groups with different, known distributions
    rows = [("a", float(v)) for v in range(101)] + [
        ("b", float(v * v)) for v in range(51)
    ]
    return spark.createDataFrame(rows, ["g", "v"]).persist()


def test_exact_matches_numpy(spark, vals):
    out = {
        r["g"]: (r["p50"], r["p95"], r["p99"])
        for r in ST.grouped_percentiles(vals, "v", group_by="g").collect()
    }
    a = np.arange(101.0)
    b = (np.arange(51.0)) ** 2
    for g, arr in (("a", a), ("b", b)):
        want = tuple(np.percentile(arr, [50, 95, 99], method="linear"))
        assert out[g] == pytest.approx(want, rel=1e-12)


def test_global_and_custom_names(spark, vals):
    out = ST.grouped_percentiles(vals, "v", percentiles=(0.999,))
    assert out.columns == ["p99_9"]
    assert out.count() == 1


def test_approx_within_rank_error(spark, vals):
    exact = {
        r["g"]: r["p95"]
        for r in ST.grouped_percentiles(vals, "v", (0.95,), "g").collect()
    }
    approx = {
        r["g"]: r["p95"]
        for r in ST.approx_grouped_percentiles(
            vals, "v", (0.95,), "g", accuracy=10_000
        ).collect()
    }
    a = np.arange(101.0)
    b = (np.arange(51.0)) ** 2
    for g, arr in (("a", a), ("b", b)):
        # value at a rank within ±1 of the exact rank
        lo = np.percentile(arr, 94, method="lower")
        hi = np.percentile(arr, 96, method="higher")
        assert lo <= approx[g] <= hi, (g, approx[g], exact[g])


def test_validation(spark, vals):
    with pytest.raises(ValueError):
        ST.grouped_percentiles(vals, "v", percentiles=(1.5,))
    with pytest.raises(ValueError):
        ST.approx_grouped_percentiles(vals, "v", accuracy=0)
