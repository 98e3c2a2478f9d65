"""Bloom filter: no false negatives ever, bounded false positives,
build/probe parity with a from-first-principles Python reference."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jepl_spark.operators import bloom as B


def py_bucket(v, j, n_bits):
    h = int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:15], 16)
    return h % n_bits


def py_bloom(values, n_bits, k):
    words = [0] * ((n_bits + B.WORD_BITS - 1) // B.WORD_BITS)
    for v in values:
        for j in range(k):
            b = py_bucket(v, j, n_bits)
            words[b // B.WORD_BITS] |= 1 << (b % B.WORD_BITS)
    return words


N_BITS, K = 63 * 40, 3  # small on purpose: false positives must occur


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 200).selectExpr("id * 3 AS key").persist()


def test_words_match_python_reference(spark, keys):
    got = B.collect_words(B.bloom_build(keys, "key", N_BITS, K), N_BITS)
    want = py_bloom([i * 3 for i in range(200)], N_BITS, K)
    assert got == want


def test_no_false_negatives(spark, keys):
    words = B.collect_words(B.bloom_build(keys, "key", N_BITS, K), N_BITS)
    probe = spark.range(0, 200).selectExpr("id * 3 AS key")
    kept = B.bloom_prune(probe, "key", words, N_BITS, K).count()
    assert kept == 200  # every inserted key must pass


def test_false_positive_rate_bounded(spark, keys):
    words = B.collect_words(B.bloom_build(keys, "key", N_BITS, K), N_BITS)
    # 10_000 keys that were never inserted (odd numbers)
    probe = spark.range(0, 10_000).selectExpr("id * 2 + 1 AS key")
    fp = B.bloom_prune(probe, "key", words, N_BITS, K).count()
    est = B.expected_fpr(200, N_BITS, K)
    assert 0 < fp / 10_000 < 4 * est  # positives exist but are bounded


def test_xxhash_variant_no_false_negatives(spark, keys):
    f = B.bloom_build(keys, "key", N_BITS, K, hasher="xxhash64")
    words = B.collect_words(f, N_BITS)
    probe = spark.range(0, 200).selectExpr("id * 3 AS key")
    assert B.bloom_prune(probe, "key", words, N_BITS, K,
                         hasher="xxhash64").count() == 200


def test_prune_is_projection_no_shuffle(spark, keys):
    words = B.collect_words(B.bloom_build(keys, "key", N_BITS, K), N_BITS)
    probe = spark.range(0, 1000).selectExpr("id AS key")
    plan = B.bloom_prune(probe, "key", words, N_BITS, K)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side only — the operator's point


def test_validation(spark, keys):
    with pytest.raises(ValueError):
        B.bloom_build(keys, "key", 10, 3)
    with pytest.raises(ValueError):
        B.might_contain(F.col("key"), [0], 63, 0)
    with pytest.raises(ValueError):
        B.bloom_build(keys, "key", 6300, 3, hasher="sha1")


def test_null_keys_never_pass(spark):
    """NULL keys must act like a semi-join: excluded at build, False
    at probe (not collapsed onto a shared sentinel hash)."""
    build = spark.createDataFrame([(1,), (2,), (None,)], "key: int")
    words = B.collect_words(B.bloom_build(build, "key", N_BITS, K), N_BITS)
    probe = spark.createDataFrame([(1,), (None,), (None,)], "key: int")
    kept = B.bloom_prune(probe, "key", words, N_BITS, K).collect()
    assert [r["key"] for r in kept] == [1]
    # and the boolean form is False, not NULL
    vals = probe.select(
        B.might_contain(F.col("key"), words, N_BITS, K).alias("m")
    ).collect()
    assert [r["m"] for r in vals] == [True, False, False]


def test_large_filter_broadcast_path_equals_literal_path(spark, keys):
    """Above _LITERAL_WORDS_MAX, bloom_prune switches to the broadcast
    binding — results must be identical to the literal predicate."""
    big_bits = 63 * (B._LITERAL_WORDS_MAX + 64)
    words = B.collect_words(B.bloom_build(keys, "key", big_bits, K), big_bits)
    probe = spark.range(0, 3000).selectExpr("id AS key")
    via_prune = {r["key"] for r in
                 B.bloom_prune(probe, "key", words, big_bits, K).collect()}
    via_literal = {r["key"] for r in probe.where(
        B.might_contain(F.col("key"), words, big_bits, K)).collect()}
    assert via_prune == via_literal
    assert {i * 3 for i in range(200)} & via_prune == {
        i * 3 for i in range(200) if i * 3 < 3000
    }


def test_broadcast_path_tolerates_reserved_column_name(spark, keys):
    big_bits = 63 * (B._LITERAL_WORDS_MAX + 64)
    words = B.collect_words(B.bloom_build(keys, "key", big_bits, K), big_bits)
    probe = spark.range(0, 100).selectExpr(
        "id * 3 AS key", "array(id) AS __bloom_words"
    )
    out = B.bloom_prune(probe, "key", words, big_bits, K)
    assert "__bloom_words" in out.columns  # caller's column survives
    assert out.count() > 0
