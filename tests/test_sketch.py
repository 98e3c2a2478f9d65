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


def test_mixed_k_merge_raises_even_when_kmv_pruned(spark):
    """The guard is a filter, so Catalyst column pruning cannot drop it
    when the caller never touches the 'kmv' column (the withColumn
    formulation silently passed this exact consumption shape)."""
    df = spark.range(100).selectExpr("id AS v")
    s1 = K.kmv_sketch(df, "v", k=16)
    s2 = K.kmv_sketch(df, "v", k=32)
    with pytest.raises(Exception) as ei:
        K.kmv_merge(s1.unionByName(s2)).select("kmv_k").collect()
    assert "mixed k" in str(ei.value)


def test_k_validation(spark):
    df = spark.range(10).selectExpr("id AS v")
    with pytest.raises(ValueError):
        K.kmv_sketch(df, "v", k=1)


# ---------------------------------------------------------------------------
# Count-Min sketch


@pytest.fixture(scope="module")
def zipfy(spark):
    """Skewed key frequencies: key i appears (50 - i) times, i in 0..49
    — exact counts are known in closed form."""
    return (
        spark.range(0, 50)
        .selectExpr("id AS k", "50 - id AS reps")
        .selectExpr("k", "explode(sequence(1, reps)) AS _")
        .select("k")
        .persist()
    )


def _exact(zipfy):
    return {r["k"]: r["n"] for r in
            zipfy.groupBy("k").agg(F.count("*").alias("n")).collect()}


class TestCountMin:
    def test_one_sided_error_and_exact_when_wide(self, spark, zipfy):
        exact = _exact(zipfy)
        qs = spark.range(0, 50).selectExpr("id AS k")
        # narrow sketch: collisions guaranteed, est must never undershoot
        narrow = K.cms_sketch(zipfy, "k", width=16, depth=3)
        est_n = {r["k"]: r["est"] for r in
                 K.cms_lookup(narrow, qs, "k", width=16, depth=3).collect()}
        assert all(est_n[k] >= exact[k] for k in exact)
        assert any(est_n[k] > exact[k] for k in exact)  # collisions real
        # wide sketch: 50 keys in 4096x4 buckets -> exact w.h.p.
        wide = K.cms_sketch(zipfy, "k", width=4096, depth=4)
        est_w = {r["k"]: r["est"] for r in
                 K.cms_lookup(wide, qs, "k", width=4096, depth=4).collect()}
        assert est_w == exact

    def test_absent_key_estimates_small(self, spark, zipfy):
        qs = spark.range(1000, 1010).selectExpr("id AS k")
        est = {r["k"]: r["est"] for r in
               K.cms_lookup(K.cms_sketch(zipfy, "k", width=4096, depth=4),
                             qs, "k", width=4096, depth=4).collect()}
        assert all(v == 0 for v in est.values())

    def test_merge_equals_whole(self, spark, zipfy):
        """Sketch(A) + Sketch(B) == Sketch(A ∪ B), counter for counter."""
        a = zipfy.where("k < 25")
        b = zipfy.where("k >= 25")
        merged = K.cms_merge(
            K.cms_sketch(a, "k", width=64, depth=3).unionByName(
                K.cms_sketch(b, "k", width=64, depth=3)
            )
        )
        whole = K.cms_sketch(zipfy, "k", width=64, depth=3)
        ms = sorted(map(tuple, merged.select("d", "bucket", "cnt").collect()))
        ws = sorted(map(tuple, whole.select("d", "bucket", "cnt").collect()))
        assert ms == ws

    def test_mixed_shape_merge_rejected(self, spark, zipfy):
        bad = K.cms_sketch(zipfy, "k", width=64, depth=3).unionByName(
            K.cms_sketch(zipfy, "k", width=128, depth=3)
        )
        with pytest.raises(Exception, match="mixed width/depth"):
            K.cms_merge(bad).collect()

    def test_weighted(self, spark):
        df = spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 7)], ["k", "bytes"]
        )
        sk = K.cms_sketch(df, "k", width=1024, depth=3, weight_col="bytes")
        qs = spark.createDataFrame([("a",), ("b",)], ["k"])
        est = {r["k"]: r["est"] for r in
               K.cms_lookup(sk, qs, "k", width=1024, depth=3).collect()}
        assert est == {"a": 15, "b": 7}

    def test_grouped(self, spark, zipfy):
        g = zipfy.withColumn("grp", (F.col("k") % 2).cast("string"))
        sk = K.cms_sketch(g, "k", width=2048, depth=3, group_by="grp")
        qs = (
            spark.range(0, 10)
            .selectExpr("id AS k", "CAST(id % 2 AS STRING) AS grp")
        )
        est = {(r["grp"], r["k"]): r["est"] for r in
               K.cms_lookup(sk, qs, "k", width=2048, depth=3,
                             group_by="grp").collect()}
        # key k only lives in group k%2 and appears 50-k times
        for (grp, k), v in est.items():
            assert v == (50 - k if int(grp) == k % 2 else 0)

    def test_bad_shape(self, spark, zipfy):
        with pytest.raises(ValueError):
            K.cms_sketch(zipfy, "k", width=1, depth=0)


class TestCmsNullsAndMergeGuard:
    def test_null_values_excluded(self, spark):
        df = spark.createDataFrame([("a",), (None,), (None,)], "k: string")
        sk = K.cms_sketch(df, "k", width=64, depth=2)
        # only 'a' contributes: one bucket per depth row, each cnt=1
        assert sorted(r["cnt"] for r in sk.collect()) == [1, 1]

    def test_mixed_shape_merge_raises_even_when_buckets_disjoint(self, spark):
        """Sparse sketches of different widths may share NO (d, bucket)
        row — the shape check must still fire (it is per output group,
        not per bucket, and survives column pruning)."""
        a = K.cms_sketch(
            spark.createDataFrame([("x",)], "k: string"), "k",
            width=64, depth=1)
        b = K.cms_sketch(
            spark.createDataFrame([("y",)], "k: string"), "k",
            width=4096, depth=1)
        bad = a.unionByName(b)
        if {r["bucket"] for r in a.collect()} & {r["bucket"] for r in b.collect()}:
            pytest.skip("buckets collided; disjointness not exercised")
        with pytest.raises(Exception, match="mixed width/depth"):
            K.cms_merge(bad).select("d").count()  # prune-hostile consumer


def test_cms_windowed_batch_matches_flat_per_window(spark):
    """The windowed sketch restricted to one window equals a flat
    cms_sketch of that window's rows — window partitioning only
    partitions, never changes counters."""
    from pyspark.sql import functions as F

    rows = [("2024-01-01 00:10:00", 1), ("2024-01-01 00:20:00", 1),
            ("2024-01-01 00:40:00", 2), ("2024-01-01 01:10:00", 1)]
    df = spark.createDataFrame(rows, ["ts", "k"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "k")
    wsk = K.cms_sketch_windowed(df, "k", "ts", "1 hour", width=64, depth=2)
    first = wsk.where("window_start = timestamp '2024-01-01 00:00:00'")
    flat = K.cms_sketch(df.where("ts < timestamp '2024-01-01 01:00:00'"),
                        "k", width=64, depth=2)
    a = sorted((r["d"], r["bucket"], r["cnt"]) for r in first.collect())
    b = sorted((r["d"], r["bucket"], r["cnt"]) for r in flat.collect())
    assert a == b and len(a) > 0
    # and windows merge to the flat whole-corpus sketch
    merged = K.cms_merge(wsk.drop("window_start", "window_end"))
    whole = K.cms_sketch(df, "k", width=64, depth=2)
    ms = sorted((r["d"], r["bucket"], r["cnt"]) for r in merged.collect())
    ws = sorted((r["d"], r["bucket"], r["cnt"]) for r in whole.collect())
    assert ms == ws
