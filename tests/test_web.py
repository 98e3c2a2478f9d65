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


def test_stream_domain_cap_single_batch_matches_batch_op(spark, tmp_path):
    """One micro-batch of the whole input reproduces per_domain_cap
    exactly (the gate's SQL-replayable configuration)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    rows = [(i, f"https://www.d{i % 5}.com/p/{i}") for i in range(60)]
    rows += [(100, "garbage"), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    want = {
        (r["domain"], r["doc_id"], r["rk"])
        for r in W.per_domain_cap(df, "url", "doc_id", cap=4,
                                  rank_col="rk").collect()
    }

    src = str(tmp_path / "src")
    import os
    os.makedirs(src)
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array([r[1] for r in rows], pa.string()),
        }),
        os.path.join(src, "b0.parquet"),
    )
    schema = StructType([
        StructField("doc_id", LongType()), StructField("url", StringType()),
    ])
    admitted = W.stream_domain_cap(
        file_stream(spark, src, schema), "url", "doc_id", cap=4
    )
    assert admitted.isStreaming
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    q = (
        admitted.writeStream.outputMode("append")
        .foreachBatch(lambda d, b: sink.write_batch(d, b))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = {
        (r["domain"], r["id"], r["admitted_rank"])
        for r in sink.read_committed(spark).collect()
    }
    assert got == want


def test_stream_domain_cap_budget_across_batches(spark, tmp_path):
    """Lifetime budget: batch 1 admits up to the cap per domain; batch
    2 arrivals to an exhausted domain drop, a fresh domain admits, and
    a partially-used domain admits only its remainder."""
    import pyarrow as pa
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from streaming_helpers import write_batches

    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    def u(d, i):
        return {"doc_id": i, "url": f"https://www.{d}.com/p/{i}"}

    batches = [
        # full.com gets 3 (cap), part.com gets 1
        [u("full", 1), u("full", 2), u("full", 3), u("part", 10)],
        # full.com exhausted; part.com has 2 left but 3 arrive;
        # fresh.com admits all 2
        [u("full", 4), u("part", 11), u("part", 12), u("part", 13),
         u("fresh", 20), u("fresh", 21)],
    ]
    pa_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("url", pa.string())]
    )
    src = str(tmp_path / "src")
    write_batches(src, batches, pa_schema)
    schema = StructType([
        StructField("doc_id", LongType()), StructField("url", StringType()),
    ])
    admitted = W.stream_domain_cap(
        file_stream(spark, src, schema, max_files_per_trigger=1),
        "url", "doc_id", cap=3,
    )
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    q = (
        admitted.writeStream.outputMode("append")
        .foreachBatch(lambda d, b: sink.write_batch(d, b))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    rows = sink.read_committed(spark).collect()
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r["domain"], []).append(
            (r["admitted_rank"], r["id"]))
    assert sorted(i for _, i in by_dom["full.com"]) == [1, 2, 3]
    part = sorted(by_dom["part.com"])
    assert part[0] == (1, 10) and len(part) == 3
    assert {i for _, i in part[1:]} <= {11, 12, 13}
    assert sorted(i for _, i in by_dom["fresh.com"]) == [20, 21]
    # ranks are 1..n per domain, no duplicates
    for d, lst in by_dom.items():
        assert sorted(r for r, _ in lst) == list(range(1, len(lst) + 1))
    import pytest as _pt
    with _pt.raises(ValueError):
        W.stream_domain_cap(admitted, "url", "doc_id", cap=0)


def test_canonical_url_rules(spark):
    cases = [
        (0, "https://WWW.Example.COM:443/Path/To/?utm_source=x&q=1#frag",
         "https://example.com/Path/To/?q=1"),
        (1, "http://example.com:80/", "http://example.com"),
        # four ADJACENT trackers die within the three passes
        (2, "https://example.com/a/?utm_a=1&utm_b=2&utm_c=3&utm_d=4&k=5",
         "https://example.com/a/?k=5"),
        (3, "https://example.com/?utm_only=1", "https://example.com"),
        # bare ref is SEMANTIC (?ref=main vs ?ref=dev) — never stripped
        (4, "https://example.com/x?a=1&ref=foo",
         "https://example.com/x?a=1&ref=foo"),
        # interior tracker between two kept params: no '&&' residue
        (5, "https://example.com/x?a=1&utm_source=t&b=2",
         "https://example.com/x?a=1&b=2"),
        # a literal '&&' in the PATH is content, never collapsed
        (11, "https://example.com/a&&b", "https://example.com/a&&b"),
        (12, "https://example.com/a&b", "https://example.com/a&b"),
        # path case preserved; non-default port kept; www in the middle kept
        (6, "HTTP://WwW.A.com/CaseD", "http://a.com/CaseD"),
        (7, "https://example.com:8443/x", "https://example.com:8443/x"),
        (8, "https://www.example.com/www.page", "https://example.com/www.page"),
        (9, "not a url", "not a url"),
        (10, None, None),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases],
                               "i long, u string")
    got = {r["i"]: r["c"] for r in
           df.select("i", W.canonical_url(F.col("u")).alias("c")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_min_id_per_canonical(spark):
    rows = [
        (0, "https://example.com/page"),
        (1, "https://WWW.example.com/page/?utm_source=x"),   # dup of 0
        (2, "https://example.com/page#frag"),                # dup of 0
        (3, "https://example.com/other"),
        (4, None),                                           # no URL: kept
        (5, "https://example.com/page?a=1"),                 # distinct (param)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = W.url_dedup(df, keep_canonical_col="canon")
    got = {r["doc_id"]: r["canon"] for r in kept.collect()}
    assert sorted(got) == [0, 3, 4, 5]
    assert got[0] == "https://example.com/page"
    assert got[4] is None
    # partitioning invariance
    again = {r["doc_id"] for r in W.url_dedup(df.repartition(5)).collect()}
    assert again == set(got)


def test_canonical_url_idempotent(spark):
    """canonical_url is a canonical form: applying it twice equals
    applying it once (over the full rule-triggering case set)."""
    urls = [
        "https://WWW.Example.COM:443/Path/?utm_a=1&utm_b=2&b=3#f",
        "http://example.com:80/x/",
        "https://example.com/?utm_only=1",
        "https://example.com/x?a=1&ref=r&fbclid=z",
        "https://example.com/x?a=1&utm_mid=x&b=2&gclid=y&c=3",
        "HTTP://WwW.A.com/B/",
        "https://example.com:8443/x?gclid=1",
        "relative/path?utm_x=1",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = W.canonical_url(F.col("u"))
    rows = df.select(
        once.alias("c1"), W.canonical_url(once).alias("c2")
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


def test_stream_domain_cap_string_ids(spark, tmp_path):
    """Review finding: string doc ids must survive the streaming cap
    with their identity intact (not silently cast to NULL longs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os
    from pyspark.sql.types import StringType, StructField, StructType

    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    rows = [(f"doc-{i:05d}", f"https://www.d{i % 2}.com/p/{i}")
            for i in range(10)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows]),
                  "url": pa.array([r[1] for r in rows])}),
        os.path.join(src, "b0.parquet"),
    )
    schema = StructType([
        StructField("doc_id", StringType()), StructField("url", StringType()),
    ])
    admitted = W.stream_domain_cap(
        file_stream(spark, src, schema), "url", "doc_id", cap=3
    )
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    q = (
        admitted.writeStream.outputMode("append")
        .foreachBatch(lambda d, b: sink.write_batch(d, b))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = sink.read_committed(spark).collect()
    assert len(got) == 6  # 3 per domain
    assert all(r["id"] is not None and r["id"].startswith("doc-")
               for r in got)
    # matches the batch op's kept set exactly
    df = spark.createDataFrame(rows, "doc_id string, url string")
    want = {r["doc_id"]
            for r in W.per_domain_cap(df, "url", "doc_id", cap=3).collect()}
    assert {r["id"] for r in got} == want


def test_stream_domain_cap_restart_resumes_budget(spark, tmp_path):
    """Checkpoint restart: the per-domain budget state survives —
    batch 2 processed after a stop/restart admits only the remainder,
    and re-running with no new data commits nothing new."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = StructType([
        StructField("doc_id", LongType()), StructField("url", StringType()),
    ])

    def write_file(name, rows):
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                      "url": pa.array([r[1] for r in rows])}),
            os.path.join(src, name),
        )

    def run():
        sink = IdempotentParquetSink(str(tmp_path / "sink"))
        admitted = W.stream_domain_cap(
            file_stream(spark, src, schema), "url", "doc_id", cap=3
        )
        q = (
            admitted.writeStream.outputMode("append")
            .foreachBatch(lambda d, b: sink.write_batch(d, b))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)
        return sink

    # run 1: two docs of d.com admit (budget 3)
    write_file("b0.parquet", [(1, "https://d.com/1"), (2, "https://d.com/2")])
    sink = run()
    assert sink.read_committed(spark).count() == 2

    # restart with one more file: 3 more arrivals, only 1 slot left
    write_file("b1.parquet", [(3, "https://d.com/3"), (4, "https://d.com/4"),
                              (5, "https://d.com/5")])
    sink = run()
    rows = sorted((r["id"], r["admitted_rank"])
                  for r in sink.read_committed(spark).collect())
    assert len(rows) == 3
    by_id = dict(rows)
    # batch-1 admissions hold ranks 1-2 (hash order within the batch);
    # the restarted batch consumes the single remaining slot as rank 3
    assert sorted(by_id[i] for i in (1, 2)) == [1, 2]
    (late_id,) = set(by_id) - {1, 2}
    assert by_id[late_id] == 3 and late_id in {3, 4, 5}

    # idle restart: nothing new commits
    n_batches = sink.committed_count(spark)
    sink = run()
    assert sink.committed_count(spark) == n_batches


def test_canonical_url_component_grid(spark):
    """Systematic sweep: URLs built from a component grid (scheme case
    x www x port x path shape x tracker positions x fragment) must
    canonicalize (a) idempotently, (b) with every tracker parameter
    gone and every kept parameter preserved IN ORDER, (c) with the
    path's case and content untouched."""
    import itertools
    import re

    urls = []
    for scheme, www, port, path, params, frag in itertools.product(
        ["https://", "HTTPS://", "http://"],
        ["", "www.", "WWW."],
        ["", ":443", ":8080"],
        ["/Path/Sub", "/a&&b", ""],
        ["", "?a=1", "?utm_s=1&a=1", "?a=1&gclid=x&b=2",
         "?fbclid=1&utm_a=2&utm_b=3&a=1"],
        ["", "#frag"],
    ):
        urls.append(scheme + www + "Example.COM" + port + path + params + frag)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    c1 = W.canonical_url(F.col("u"))
    rows = df.select(
        "u", c1.alias("c"), W.canonical_url(c1).alias("cc")
    ).collect()
    assert len(rows) == len(urls)
    for r in rows:
        u, c, cc = r["u"], r["c"], r["cc"]
        assert c == cc, (u, c, cc)                       # idempotent
        q = c.split("?", 1)[1] if "?" in c else ""
        assert not re.search(r"(^|&)(utm_|gclid|fbclid|msclkid)", q), (u, c)
        # kept params survive in order
        want = [p for p in (u.split("?", 1)[1].split("#")[0].split("&")
                            if "?" in u else [])
                if not re.match(r"(utm_|gclid|fbclid|msclkid)", p)]
        got = [p for p in q.split("&") if p] if q else []
        assert got == want, (u, c, want, got)
        # path case/content untouched (trailing slash aside)
        if "/Path/Sub" in u:
            assert "/Path/Sub" in c, (u, c)
        if "/a&&b" in u:
            assert "/a&&b" in c, (u, c)
        assert "#" not in c and "www." not in c.split("/")[2], (u, c)


# -- HTML→text extraction (round-6 lane) -------------------------------------

# (input, exact expected output) — the CONTENT anchor: these pin the
# chain's behavior independently of the oracle (which pins only
# cross-engine equivalence, since both sides fold the same spec)
_HTML_CASES = [
    ("<html><head><title>T</title><style>p{color:red}</style></head>"
     "<body><p>Hello world</p></body></html>", "Hello world"),
    ("<p>a</p><p>b</p>", "a\nb"),                     # line structure
    ("<div><p>nested <b>bold</b> text</p></div>", "nested bold text"),
    ("<b>unclosed bold", "unclosed bold"),            # unclosed inline
    ('<script>if(a<b){document.write("<p>x</p>")}</script>after',
     "after"),                                        # markup inside JS
    ("<script src='x.js'>var leaked=1; // crawl truncated", ""),
    ("<style>body{}  truncated", ""),                 # unclosed style
    ("<!-- c -->kept<!-- unclosed", "kept"),          # unclosed comment
    ("before<![CDATA[x < y & z]]>after", "beforex < y & zafter"),
    ("Tom &amp; Jerry &lt;tag&gt; &quot;q&quot; &apos;a&apos; "
     "&#39;n&#39; x&nbsp;y", "Tom & Jerry <tag> \"q\" 'a' 'n' x y"),
    # single-pass decode: &amp;lt; is the TEXT '&lt;', never '<'
    ("double &amp;lt; encode &amp;amp;", "double &lt; encode &amp;"),
    ("<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
    ("<br/>line<br>break<hr>", "line\nbreak"),
    ("plain text no markup at all", "plain text no markup at all"),
    ("<table><tr><td>a</td><td>b</td></tr></table>", "a\nb"),
    ("<a href='x?a=1&b=2'>link</a> tail", "link tail"),
    ("<P CLASS='X'>upper</P>", "upper"),              # case-insensitive
    ("<?xml version='1.0'?><!DOCTYPE html><html>x</html>", "x"),
    ("< notatag but kept", "< notatag but kept"),
    ("", ""),
    ("<header>h</header><article>art</article><footer>f</footer>",
     "h\nart\nf"),
    # documented approximation: '>' inside a quoted attribute ends the
    # tag early — the residue is text, never a crash
    ('<a title="a>b">early end</a>', 'b">early end'),
]


def test_html_to_text_adversarial_content(spark):
    """Exact expected extractions for nested/unclosed tags, CDATA,
    entities (incl. double-encoding), script-containing-markup,
    truncated crawls, and the documented attribute-'>' approximation."""
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(_HTML_CASES)], ["i", "h"]
    )
    got = {r["i"]: r["t"] for r in df.select(
        "i", W.html_to_text(F.col("h")).alias("t")).collect()}
    for i, (h, want) in enumerate(_HTML_CASES):
        assert got[i] == want, (h, got[i], want)
    # NULL propagates
    n = spark.createDataFrame([(None,)], "h string").select(
        W.html_to_text(F.col("h")).alias("t")).first()
    assert n["t"] is None
    # extraction is idempotent on its own output (no '<'/'&' left that
    # a second pass would reinterpret, for these fixtures)
    twice = {r["i"]: r["t"] for r in df.select(
        "i", W.html_to_text(W.html_to_text(F.col("h"))).alias("t")
    ).collect()}
    for i, (h, want) in enumerate(_HTML_CASES):
        if "&amp;" not in h:  # double-encoded fixtures decode one level per pass, by design
            assert twice[i] == got[i], (h, twice[i], got[i])


def test_html_to_text_duckdb_twin_parity(spark):
    """The generated DuckDB chain (html_to_text_sql) must execute the
    spec identically to the Spark column — the Java∩RE2 dialect
    contract, same as scrub_pii / canonical_url."""
    import duckdb

    cases = [h for h, _ in _HTML_CASES] + [
        "text with\nnewlines\n\n\nmany",
        "  leading  and   trailing  ",
        "<pre>code  spacing</pre>next",
        "<div>a<div>b<div>c</div></div></div>",
        "&#60;b&#62;not a tag&#60;/b&#62;",
    ]
    df = spark.createDataFrame(list(enumerate(cases)), ["i", "h"])
    got = {r["i"]: r["t"] for r in df.select(
        "i", W.html_to_text(F.col("h")).alias("t")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i INT, h VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(cases)))
    ora = dict(con.execute(
        f"SELECT i, {W.html_to_text_sql('h')} FROM c").fetchall())
    assert got == ora


def test_extract_html_wrapper(spark):
    df = spark.createDataFrame(
        [(0, "<p>Hello</p>"), (1, None)], ["doc_id", "html"]
    )
    out = {r["doc_id"]: r["text"]
           for r in W.extract_html(df).select("doc_id", "text").collect()}
    assert out == {0: "Hello", 1: None}


def _url_dedup_stream_harness(spark, tmp_path, batches, ts_col="event_time",
                              watermark="10 seconds"):
    """Stage one parquet file per micro-batch (mtime-ordered), run
    stream_url_dedup through the exactly-once sink, return the sink."""
    import os
    import time as _time
    from datetime import datetime, timedelta, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    existing = len(os.listdir(src))
    for bi, rows in enumerate(batches):
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "event_time": pa.array(
                    [base + timedelta(seconds=r[2]) for r in rows],
                    pa.timestamp("us", tz="UTC"),
                ),
            }),
            os.path.join(src, f"b{existing + bi}.parquet"),
        )
        _time.sleep(0.05)  # strictly increasing mtimes => batch order
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("event_time", TimestampType()),
    ])
    out = W.stream_url_dedup(
        file_stream(spark, src, schema, max_files_per_trigger=1),
        ts_col=ts_col, watermark=watermark, keep_canonical_col="canon",
    )
    assert out.isStreaming
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return sink


def test_stream_url_dedup_variants_fold_nulls_pass(spark, tmp_path):
    """Cross-batch variant folding inside the watermark horizon, NULL
    passthrough without state, and re-admission after state eviction
    (the bounded-state contract stream_exact_dedup pins for content)."""
    batches = [
        [(0, "https://www.a.com/p?utm_source=x", 0),
         (1, "https://b.com/q", 1),
         (2, None, 1)],
        # dup of 0's canonical (www + utm folded), inside horizon -> drop;
        # another NULL url -> passes (no state key collision with 2)
        [(3, "https://a.com/p#frag", 5), (4, None, 6)],
        # watermark movers push eviction past 0's time + 10s delay
        [(5, "https://c.com/r", 4000)],
        [(6, "https://d.com/s", 4001)],
        # 0's canonical state evicted -> re-admitted
        [(7, "https://a.com/p", 3995)],
        [(8, "https://e.com/flush", 90000)],
    ]
    sink = _url_dedup_stream_harness(spark, tmp_path, batches)
    rows = sink.read_committed(spark).select("doc_id", "canon").collect()
    got = sorted(r["doc_id"] for r in rows)
    assert got == [0, 1, 2, 4, 5, 6, 7, 8], got
    canon = {r["doc_id"]: r["canon"] for r in rows}
    assert canon[0] == canon[7] == "https://a.com/p"
    assert canon[2] is None and canon[4] is None


def test_stream_url_dedup_restart_resumes_state(spark, tmp_path):
    """Checkpoint restart: dedup state survives — a variant arriving
    after stop/restart still drops against the pre-restart original,
    and an idle restart commits nothing new."""
    def run(batches):
        return _url_dedup_stream_harness(
            spark, tmp_path, batches, watermark="1 hour")

    sink = run([[(0, "https://www.a.com/p/", 0), (1, "https://b.com/q", 1)]])
    assert sink.read_committed(spark).count() == 2

    # restart with a new file: variant of 0 drops, fresh url admits
    sink = run([[(2, "https://a.com/p?utm_campaign=z", 10),
                 (3, "https://c.com/new", 11)]])
    got = sorted(r["doc_id"] for r in sink.read_committed(spark).collect())
    assert got == [0, 1, 3], got

    # idle restart: no new commits
    n = sink.committed_count(spark)
    sink = run([])
    assert sink.committed_count(spark) == n
