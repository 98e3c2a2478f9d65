"""Domain/URL curation lane: host parsing, registered-domain (eTLD+1)
derivation, deterministic per-domain caps, domain-mix report."""

import pytest
from pyspark.sql import functions as F

from jepl_spark.operators import web as W


def test_host_and_registered_domain(spark):
    rows = [
        (0, "https://www.bbc.co.uk/news/uk-12345"),
        (1, "http://sub.a.example.com:8080/x?y=1"),
        (2, "https://example.com/"),
        (3, "HTTPS://UPPER.EXAMPLE.ORG/path"),
        (4, "not a url at all"),
        (5, None),
        (6, "https://localhost/x"),
        (7, "https://news.com.au/story"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["doc_id"]: (r["host"], r["domain"])
        for r in W.with_domain(df).collect()
    }
    assert out[0] == ("www.bbc.co.uk", "bbc.co.uk")
    # parse_url HOST excludes the port
    assert out[1] == ("sub.a.example.com", "example.com")
    assert out[2] == ("example.com", "example.com")
    assert out[3] == ("upper.example.org", "example.org")
    assert out[4] == (None, None)
    assert out[5] == (None, None)
    # single-label host passes through
    assert out[6] == ("localhost", "localhost")
    # 'com.au' is a multi-label suffix → whole host IS the domain here
    assert out[7] == ("news.com.au", "news.com.au")


def test_per_domain_cap_deterministic(spark):
    # 3 domains with 20/20/2 docs; cap 5 → 5+5+2 kept, NULL-host rows
    # dropped, and the kept set is partitioning-invariant
    rows = []
    for i in range(20):
        rows.append((i, f"https://a{i % 2}.heavy.com/p/{i}"))
    for i in range(20, 40):
        rows.append((i, f"https://www.other.co.uk/p/{i}"))
    rows += [(40, "https://tiny.org/x"), (41, "https://tiny.org/y"),
             (42, "garbage"), (43, None)]
    df = spark.createDataFrame(rows, "doc_id long, url string")

    kept = W.per_domain_cap(df, "url", "doc_id", cap=5, rank_col="rk")
    got = kept.collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert sorted(by_dom) == ["heavy.com", "other.co.uk", "tiny.org"]
    assert len(by_dom["heavy.com"]) == 5
    assert len(by_dom["other.co.uk"]) == 5
    assert sorted(by_dom["tiny.org"]) == [40, 41]
    assert all(1 <= r["rk"] <= 5 for r in got)

    again = W.per_domain_cap(
        df.repartition(7), "url", "doc_id", cap=5, rank_col="rk"
    ).collect()
    assert sorted((r["doc_id"], r["rk"]) for r in again) == sorted(
        (r["doc_id"], r["rk"]) for r in got
    )
    # a different seed draws a different (but equally sized) sample
    other = W.per_domain_cap(df, "url", "doc_id", cap=5, seed="s2").collect()
    assert len(other) == len(got)


def test_domain_mix_report(spark):
    rows = (
        [(i, "https://big.com/" + str(i)) for i in range(30)]
        + [(100 + i, "https://mid.net/" + str(i)) for i in range(10)]
        + [(200, "https://one.io/"), (201, "bad url")]
    )
    df = spark.createDataFrame(rows, "doc_id long, url string")
    rep = W.domain_mix_report(df, "url", top=2).collect()
    assert [(r["rank"], r["domain"], r["cnt"]) for r in rep] == [
        (1, "big.com", 30), (2, "mid.net", 10),
    ]
    # shares are of the 41 attributable rows
    assert abs(rep[0]["share"] - 30 / 41) < 1e-12
