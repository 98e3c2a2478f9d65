"""KMV sketch: exact-path, estimator accuracy, lossless merge, and
bit-exact parity with a from-first-principles Python reference."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from jepl_spark.operators import sketch as K

DOMAIN = 1 << 60


def py_hash(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def py_sketch(values, k):
    hs = sorted({py_hash(v) for v in values})
    return hs[:k]


def py_estimate(arr, k):
    if len(arr) < k:
        return float(len(arr))
    return (k - 1.0) * DOMAIN / arr[k - 1]


def test_exact_path_small_group(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "v bigint")
    [row] = K.kmv_distinct(df, "v", k=64).collect()
    assert row["est_distinct"] == 7.0


def test_estimator_accuracy_large(spark):
    n = 10_000
    df = spark.range(n).selectExpr("id AS v")
    [row] = K.kmv_distinct(df, "v", k=256).collect()
    assert abs(row["est_distinct"] - n) / n < 0.15


def test_sketch_matches_python_reference(spark):
    vals = [f"doc-{i}" for i in range(500)] * 3  # dups collapse
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    [row] = K.kmv_sketch(df, "v", k=32).collect()
    assert list(row["kmv"]) == py_sketch(vals, 32)
    [est] = K.kmv_distinct(df, "v", k=32).collect()
    assert est["est_distinct"] == pytest.approx(
        py_estimate(py_sketch(vals, 32), 32), rel=0, abs=0
    )


def test_grouped_sketch(spark):
    rows = [("a", i) for i in range(40)] + [("b", i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {r["g"]: list(r["kmv"]) for r in K.kmv_sketch(df, "v", k=16, group_by="g").collect()}
    assert got["a"] == py_sketch(range(40), 16)
    assert got["b"] == py_sketch(range(5), 16)
    assert len(got["b"]) == 5  # under k: whole set kept


def test_merge_is_lossless(spark):
    a = spark.range(0, 3000).selectExpr("id AS v", "'x' AS part")
    b = spark.range(2000, 6000).selectExpr("id AS v", "'y' AS part")
    union = a.union(b)
    sk_parts = K.kmv_sketch(a.union(b), "v", k=128, group_by="part")
    merged = K.kmv_merge(sk_parts, group_by=None)
    [m] = merged.collect()
    [whole] = K.kmv_sketch(union, "v", k=128).collect()
    assert list(m["kmv"]) == list(whole["kmv"])  # merge == sketch-of-union
    est = K.kmv_estimate(F.col("kmv"), F.col("kmv_k"))
    [e] = merged.select(est.alias("e")).collect()
    # union holds 0..5999 -> 6000 distinct; estimate is bit-exact vs
    # the python reference and within 1/sqrt(k) of truth
    assert e["e"] == py_estimate(py_sketch(range(6000), 128), 128)
    assert abs(e["e"] - 6000) / 6000 < 0.15


def test_partial_buckets_change_nothing(spark):
    df = spark.range(2000).selectExpr("id AS v")
    [a] = K.kmv_sketch(df, "v", k=64, partial_buckets=1).collect()
    [b] = K.kmv_sketch(df, "v", k=64, partial_buckets=32).collect()
    assert list(a["kmv"]) == list(b["kmv"])


def test_mixed_k_merge_raises(spark):
    df = spark.range(100).selectExpr("id AS v")
    s1 = K.kmv_sketch(df, "v", k=16)
    s2 = K.kmv_sketch(df, "v", k=32)
    with pytest.raises(Exception) as ei:
        K.kmv_merge(s1.unionByName(s2)).collect()
    assert "mixed k" in str(ei.value)


def test_k_validation(spark):
    df = spark.range(10).selectExpr("id AS v")
    with pytest.raises(ValueError):
        K.kmv_sketch(df, "v", k=1)
