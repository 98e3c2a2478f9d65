"""Token-level transcript agreement (transcript_wer) tests: the numpy
DP against a brute-force reference, NULL/empty semantics, the WER
denominator guard, and the admission column."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from jepl_spark.operators.text import transcript_wer


def brute_token_dist(a, b):
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[n][m]


def test_known_distances(spark):
    rows = [
        (0, "a b c", "a b c"),      # identical -> 0
        (1, "a b c", "a x c"),      # one substitution
        (2, "a b c", "b c"),        # one deletion
        (3, "a b c", "a b c d e"),  # two insertions
        (4, "a b c d", "d c b a"),  # heavy rewrite
        (5, "aa ab", "ab aa"),      # token (not char) granularity
    ]
    exp = {0: 0, 1: 1, 2: 1, 3: 2, 4: 4, 5: 2}
    df = spark.createDataFrame(rows, "id long, text string, hyp string")
    out = {r["id"]: r for r in transcript_wer(df).collect()}
    for i, d in exp.items():
        assert out[i]["edit_dist"] == d
        assert out[i]["wer"] == pytest.approx(
            d / max(out[i]["n_ref_tokens"], 1)
        )


def test_randomized_vs_brute(spark):
    rng = random.Random(1234)
    vocab = [f"t{k}" for k in range(7)] + ["aa", "ab", "ba"]
    rows = []
    for i in range(120):
        a = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
        b = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
        rows.append((i, " ".join(a), " ".join(b)))
    df = spark.createDataFrame(rows, "id long, text string, hyp string")
    out = {r["id"]: r for r in transcript_wer(df).collect()}
    for i, a, b in rows:
        ta, tb = a.split(), b.split()
        assert out[i]["edit_dist"] == brute_token_dist(ta, tb), (i, a, b)
        assert out[i]["n_ref_tokens"] == len(ta)
        assert out[i]["n_hyp_tokens"] == len(tb)


def test_null_and_empty_semantics(spark):
    rows = [
        (0, None, "a b"),
        (1, "a b", None),
        (2, "", ""),
        (3, "   ", "x y z"),   # blank ref -> n_ref 0, wer = n_hyp / 1
        (4, "x y", ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string, hyp string")
    out = {r["id"]: r for r in transcript_wer(df, max_wer=0.5).collect()}
    for i in (0, 1):
        r = out[i]
        assert r["edit_dist"] is None and r["wer"] is None
        assert r["reject_reason"] is None  # NULL never rejects
    assert out[2]["edit_dist"] == 0 and out[2]["wer"] == 0.0
    assert out[3]["n_ref_tokens"] == 0
    assert out[3]["edit_dist"] == 3 and out[3]["wer"] == 3.0
    assert out[3]["reject_reason"] == "high_wer"
    assert out[4]["edit_dist"] == 2 and out[4]["wer"] == 1.0


def test_admission_threshold(spark):
    df = spark.createDataFrame(
        [(0, "a b c d", "a b c d"), (1, "a b c d", "x y c d")],
        "id long, text string, hyp string",
    )
    out = {r["id"]: r for r in transcript_wer(df, max_wer=0.25).collect()}
    assert out[0]["reject_reason"] is None          # wer 0.0
    assert out[1]["reject_reason"] == "high_wer"    # wer 0.5 > 0.25


def test_column_guards(spark):
    df = spark.createDataFrame([(0, "a", "a")], "id long, text string, hyp string")
    with pytest.raises(ValueError, match="needs column"):
        transcript_wer(df, ref_col="missing")
    with pytest.raises(ValueError, match="overwrite"):
        transcript_wer(df.withColumn("wer", F.lit(1.0)))
    # chaining after another admission gate: max_wer must not clobber
    # an existing verdict column...
    gated = df.withColumn("reject_reason", F.lit("low_rate"))
    with pytest.raises(ValueError, match="reject_reason"):
        transcript_wer(gated, max_wer=0.5)
    # ...but without max_wer the column is left untouched
    out = transcript_wer(gated).collect()[0]
    assert out["reject_reason"] == "low_rate"


def test_normalize_transcript(spark):
    from jepl_spark.operators.text import normalize_transcript

    rows = [
        (0, "Hello, World!", "hello world"),
        (1, "It's 9 AM.", "it's 9 am"),
        (2, "a--b  c", "a b c"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, hyp string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", normalize_transcript(F.col("text")).alias("n")).collect()}
    exp = {0: "hello  world", 1: "it's 9 am", 2: "a  b  c"}
    for i, e in exp.items():
        # tokenization collapses runs, so compare token streams
        assert got[i].split() == e.split(), (i, got[i])

    # normalize=True: case/punctuation differences are zero errors
    out = {r["id"]: r
           for r in transcript_wer(df, normalize=True).collect()}
    for i in range(3):
        assert out[i]["edit_dist"] == 0 and out[i]["wer"] == 0.0, out[i]
    # ...and without normalize the same pairs score errors
    raw = {r["id"]: r["edit_dist"] for r in transcript_wer(df).collect()}
    assert raw[0] > 0 and raw[2] > 0
