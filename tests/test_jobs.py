"""End-to-end tests for the packaged spark-submit jobs (driven
in-process against the session fixture)."""

from __future__ import annotations

import json
import sys


def test_corpus_pipeline_stages(spark, tmp_path, capsys, monkeypatch):
    """The curation sequence on a hand-built corpus: quality gate drops
    the junk row, language gate drops the unknown-language row, exact
    dedup folds the exact/normalized dup, near-dup dedup folds the
    near-dup — counts pinned per stage, output partitioned by lang."""
    docs = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
        (2, "THE  quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0 (normalized)
        (3, "a completely different document about the spark engine for the tests"),
        (4, "zz qq xx yy ww"),                            # und language -> dropped
        (5, "!!! ,,, ..."),                               # junk: punct ratio + tokens
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "clean")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(src)

    # the job calls SparkSession.builder...getOrCreate(), which returns
    # the session fixture in-process
    from jobs.corpus_pipeline import main

    rc = main([
        "--input", src, "--output", out,
        "--min-tokens", "4", "--max-punct-ratio", "0.3",
        "--langs", "en",
        "--near-dup-threshold", "0.5",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["stages"] == {
        "input": 6,
        "after_quality": 5,        # 5 dropped (3 tokens, punct ratio 1.0)
        "after_lang": 4,           # 4 dropped ('und')
        "after_exact_dedup": 3,    # 2 folded into 0
        "after_near_dedup": 2,     # 1 folded into 0
    }
    kept = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 3]
    assert set(kept.select("lang").distinct().toPandas()["lang"]) == {"en"}


def test_corpus_pipeline_near_dedup_policy(spark, tmp_path, capsys):
    """--near-dedup-policy: on a star-shaped near-dup cluster (docs 0
    and 1 both near doc 2, not near each other) the pair policy keeps
    two representatives, components keeps one canonical doc."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    mid = [vocab[rng.randrange(400)] for _ in range(120)]
    a = list(mid); b = list(mid)
    for i in range(0, 24):
        a[i] = f"za{i}"
    for i in range(96, 120):
        b[i] = f"zb{i}"
    docs = [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(mid)),
            (9, " ".join(vocab[rng.randrange(400)] for _ in range(120)))]
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(src)

    from jobs.corpus_pipeline import main

    base = ["--input", src, "--min-tokens", "4",
            "--near-dup-threshold", "0.5", "--report-only"]
    assert main(base) == 0
    pairs = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(base + ["--near-dedup-policy", "components"]) == 0
    comps = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pairs["stages"]["after_near_dedup"] == 3   # {0, 1, 9}
    assert comps["stages"]["after_near_dedup"] == 2   # {0, 9}


def test_corpus_pipeline_url_boilerplate_oov_stages(spark, tmp_path, capsys):
    """The three round-5 stages wired into the job: URL dedup folds
    the utm-variant row, the boilerplate strip removes the shared
    footer (so doc 5, which is ONLY footer + junk, then dies at the
    quality gate), and the OOV gate drops the gibberish doc whose
    tokens miss the survivor vocabulary."""
    body = ("the quick brown fox jumps over the lazy dog near the river "
            "{} while the other animals watch the water flow")
    footer = "COPYRIGHT FOOTER NAV LINE"
    docs = [
        (0, body.format("bank") + "\n" + footer,
         "https://example.com/a"),
        (1, body.format("bank") + "\n" + footer,
         "https://WWW.example.com/a/?utm_source=x"),   # URL-dup of 0
        (2, body.format("bend") + "\n" + footer, "https://example.com/b"),
        (3, body.format("delta") + "\n" + footer, "https://example.com/c"),
        (4, body.format("shore") + "\n" + footer, "https://example.com/d"),
        (5, "!!\n" + footer, "https://example.com/e"),  # footer+junk only
        # 24 unique gibberish tokens: below the k=25 vocabulary cutoff
        # (the vocab is the survivors' own top tokens, so a rare-token
        # doc is exactly what the OOV gate exists to catch)
        (6, " ".join(f"zx{i}qv" for i in range(24)),
         "https://example.com/f"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, ["doc_id", "text", "url"]).write.parquet(src)

    from jobs.corpus_pipeline import main

    rc = main([
        "--input", src, "--report-only",
        "--min-tokens", "4", "--url-col", "url",
        "--boilerplate-max-df", "3", "--max-oov-rate", "0.5",
        "--oov-vocab-k", "25",
        "--near-dup-threshold", "0.99",
        "--audit-output", str(tmp_path / "audit"),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    s = rep["stages"]
    assert s["input"] == 7
    assert s["after_url_dedup"] == 6      # 1 folded into 0
    assert s["after_boilerplate"] == 6    # strip changes text, not rows
    assert s["after_quality"] == 5        # 5 is now just '!!' -> dropped
    assert s["after_oov"] == 4            # 6's tokens miss the vocab
    assert s["after_exact_dedup"] == 4
    # audit trail: each planted defect attributed to its stage
    assert rep["dropped"] == {"url_dedup": 1, "quality": 1, "oov": 1}
    audit = {
        (r["doc_id"], r["drop_reason"])
        for r in spark.read.parquet(str(tmp_path / "audit")).collect()
    }
    assert audit == {(1, "url_dedup"), (5, "quality"), (6, "oov")}


def test_corpus_pipeline_html_stage(spark, tmp_path, capsys):
    """--html-col: crawled markup becomes text BEFORE every content
    stage — the script-only doc extracts to nothing and dies at the
    quality gate, two docs whose markup differs only in tags become
    exact dupes AFTER extraction, and the extracted (not raw) text is
    what the output carries, with the markup column dropped."""
    body = ("the quick brown fox jumps over the lazy dog near the "
            "river while the other animals watch the water flow")
    docs = [
        (0, f"<html><body><p>{body} bank</p></body></html>"),
        # tag-variant of 1's content: exact dupe only after extraction
        (1, f"<div><p>{body} <b>bend</b></p></div>"),
        (2, f"<span>{body} bend</span>"),
        (3, "<script>var x = 'no text at all';</script>"),
    ]
    src = str(tmp_path / "html_docs")
    spark.createDataFrame(docs, ["doc_id", "html"]).write.parquet(src)

    from jobs.corpus_pipeline import main

    out = str(tmp_path / "curated")
    rc = main([
        "--input", src, "--output", out,
        "--html-col", "html", "--min-tokens", "4",
        "--near-dup-threshold", "0.99",
        "--audit-output", str(tmp_path / "audit"),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    s = rep["stages"]
    assert s["input"] == 4
    assert s["after_quality"] == 3        # 3 extracts to "" -> dropped
    assert s["after_exact_dedup"] == 2    # 2 deduped against 1
    assert rep["dropped"] == {"quality": 1, "exact_dedup": 1}
    written = spark.read.parquet(out)
    assert "html" not in written.columns
    texts = {r["doc_id"]: r["text"] for r in written.collect()}
    assert texts[0] == f"{body} bank"
    assert texts[1] == f"{body} bend"


def test_cli_runner(spark, capsys):
    """python -m jepl_spark happy path (json rows) and compile-error
    path (reference-identical message, exit 1)."""
    import json as _json

    from jepl_spark.__main__ import main

    src = "/root/testdata/sf0.001/events.parquet"
    # no --master: under pytest getOrCreate() returns the fixture
    # session regardless, so passing one would only mislead
    rc = main([
        "select count(event_id) AS n from events where event_type = 'click'",
        "--table", f"events={src}", "--json",
    ])
    assert rc == 0
    row = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["n"] > 0

    rc = main(["select sum(value) from events", "--table", f"events={src}"])
    captured = capsys.readouterr()
    assert rc == 1 and "WHERE is required" in captured.err


def test_cli_streaming_mode(spark, tmp_path, capsys):
    """CLI --window runs the rule as a windowed streaming query through
    the exactly-once sink; re-running with the same checkpoint is a
    no-op (no duplicate rows)."""
    import json as _json

    from pyspark.sql import functions as F

    from jepl_spark.__main__ import main

    src = str(tmp_path / "events")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .write.parquet(src)
    )
    argv = [
        "select count(event_id) AS n from events where event_type = 'click'",
        "--table", f"events={src}",
        "--window", "6 hours", "--watermark", "1 hour", "--ts-col", "ts",
        "--sink", str(tmp_path / "out"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--json",
    ]
    assert main(argv) == 0
    rows1 = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert rows1 and all("window_start" in r and r["n"] >= 0 for r in rows1)

    # resume from the same checkpoint with no new data: identical output
    assert main(argv) == 0
    rows2 = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    key = lambda r: (r["window_start"], r.get("n"))  # noqa: E731
    assert sorted(map(key, rows1)) == sorted(map(key, rows2))


def test_clips_pipeline_chunk_mode(spark, tmp_path, capsys):
    """--chunk-ms: audio stream → chunker → stream-join with the
    transcript stream → exactly-once sink of (chunk, transcript) rows.
    Chunk count per clip follows the integer boundary math; every chunk
    row carries its clip's exact transcript."""
    from jepl_spark.sources.clips import clip_row
    from jobs.clips_pipeline import main

    n = 30
    argv = [
        "--audio-path", str(tmp_path / "a"),
        "--transcript-path", str(tmp_path / "t"),
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--synthesize", str(n),
        "--chunk-ms", "300", "--chunk-hop-ms", "300",
        "--chunk-min-tail-ms", "1",
        "--watermark", "10 seconds", "--max-delay", "60 seconds",
    ]
    assert main(argv) == 0
    out = spark.read.parquet(str(tmp_path / "sink"))
    rows = out.collect()
    per_clip = {}
    for r in rows:
        per_clip.setdefault(r["clip_id"], []).append(r)
    assert len(per_clip) == n
    for i in range(n):
        ref = clip_row(i)
        got = per_clip[ref["clip_id"]]
        # every chunk joined to exactly its own transcript
        assert {r["joined_transcript"] for r in got} == {ref["transcript"]}
        # full-coverage chunking: hop == chunk, all tails kept
        n_samples = ref["sr_hz"] * ref["dur_ms"] // 1000
        chunk_n = ref["sr_hz"] * 300 // 1000
        want = (n_samples + chunk_n - 1) // chunk_n
        assert len(got) == want, ref["clip_id"]


def test_corpus_pipeline_decontam_and_pack(spark, tmp_path, capsys):
    """--decontam-input removes docs quoting the benchmark; --pack-budget
    writes a span manifest whose pieces reassemble the curated docs."""
    base = ("the quick brown fox and the lazy dog run over the old "
            "river bank with a very long tale of the night ")
    docs = [(i, base + f"unique tail piece number {i} with extra words "
                       f"row{i} row{i} marker") for i in range(12)]
    # doc 0 additionally quotes the benchmark verbatim
    docs[0] = (0, docs[0][1] + " benchmark question about the meaning of "
                               "life the universe and everything else")
    bench = [("benchmark question about the meaning of life the universe "
              "and everything else entirely",)]
    src = str(tmp_path / "docs")
    bsrc = str(tmp_path / "bench")
    out = str(tmp_path / "clean")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(src)
    spark.createDataFrame(bench, ["text"]).write.parquet(bsrc)

    from jobs.corpus_pipeline import main

    rc = main([
        "--input", src, "--output", out,
        "--min-tokens", "4", "--langs", "en",
        "--near-dup-threshold", "1.01",
        "--decontam-input", bsrc, "--decontam-ngram", "8",
        "--decontam-min-hits", "2",
        "--pack-budget", "40", "--pack-shards", "2",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["stages"]["after_decontam"] == report["stages"]["after_near_dedup"] - 1
    kept = spark.read.parquet(out)
    assert 0 not in {r["doc_id"] for r in kept.collect()}
    spans = spark.read.parquet(out + "_packing")
    assert report["stages"]["packed_spans"] == spans.count() > 0
    # spans reassemble every curated doc's token count exactly
    from jepl_spark.operators import text as T
    from pyspark.sql import functions as F

    toks = {r["doc_id"]: r["n"] for r in kept.select(
        "doc_id", T.token_count(F.col("text")).alias("n")).collect()}
    got = {r["doc_id"]: r["s"] for r in spans.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("s")).collect()}
    assert got == toks
    # mutually exclusive with chunking
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["--input", src, "--output", out, "--pack-budget", "40",
              "--chunk-tokens", "16"])


def test_corpus_pipeline_lm_filter(spark, tmp_path, capsys):
    """--lm-ref-input: docs whose bigrams look nothing like the
    reference corpus score low and are dropped; reference-like docs
    survive."""
    ref_rows = [(i, "the quick brown fox jumps over the lazy dog again "
                    "and again near the old river bank every single day")
                for i in range(10)]
    docs = [
        (0, "the quick brown fox jumps over the lazy dog near the bank"),
        (1, "zq wv xk jj qqp zzt vvb nmq lkj pw qa zx cv bn mk ju hy"),
    ]
    src = str(tmp_path / "docs")
    ref = str(tmp_path / "ref")
    out = str(tmp_path / "clean")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(src)
    spark.createDataFrame(ref_rows, ["doc_id", "text"]).write.parquet(ref)

    from jobs.corpus_pipeline import main

    rc = main([
        "--input", src, "--output", out,
        "--min-tokens", "4", "--max-punct-ratio", "1.0",
        "--near-dup-threshold", "1.01",
        "--lm-ref-input", ref, "--lm-min-logp", "-2.0",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["stages"]["after_lm_filter"] == 1
    kept = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert kept == [0]


def test_corpus_pipeline_split_and_chunk(spark, tmp_path, capsys):
    """--split + --chunk-tokens: curated docs get a stable split label,
    then are written as token-window chunks partitioned by split/lang."""
    docs = [
        (i, "the quick brown fox and the lazy dog run over the old "
            "river bank with a very long tale of the night " * 3)
        for i in range(20)
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "shards")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(src)

    from jobs.corpus_pipeline import main

    rc = main([
        "--input", src, "--output", out,
        "--min-tokens", "4", "--langs", "en",
        "--near-dup-threshold", "1.01",  # disable near-dedup folding
        "--split", "train=0.8,val=0.2",
        "--chunk-tokens", "16", "--chunk-overlap", "4",
    ])
    assert rc == 0
    import json as _json
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    shards = spark.read.parquet(out)
    assert report["stages"]["chunks"] == shards.count() > 0
    assert {"chunk_idx", "chunk_text", "split", "lang"} <= set(shards.columns)
    assert set(r["split"] for r in shards.select("split").distinct().collect()) <= {"train", "val"}
    # identical texts -> identical chunk counts per doc; all docs survive
    per_doc = shards.groupBy("doc_id").count().collect()
    assert len(per_doc) == 1  # exact dedup folded the identical docs


def test_serving_pipeline_brute_and_lsh(spark, tmp_path, capsys):
    """The serving job end-to-end in both modes: brute per-batch top-k
    and the LSH index path; brute results match the batch operator, the
    LSH path returns k rows per query from the pruned candidate set."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    corpus_path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(corpus_path)
    qrows = emb.filter("vec_id IN (0, 7)").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    ).collect()
    qdir = str(tmp_path / "queries")
    import os
    os.makedirs(qdir)
    tbl = pa.table({
        "query_id": pa.array([int(r["query_id"]) for r in qrows], pa.int64()),
        "query_vec": pa.array([list(r["query_vec"]) for r in qrows],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(qdir, "q0.parquet"))

    from jobs.serving_pipeline import main

    rc = main([
        "--corpus", corpus_path, "--queries", qdir,
        "--sink", str(tmp_path / "sink-b"),
        "--checkpoint", str(tmp_path / "ckpt-b"), "--k", "4",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 8 and rep["batches"] >= 1
    got = spark.read.parquet(str(tmp_path / "sink-b") + "/data")
    from jepl_spark.operators import similarity as S

    queries = emb.filter("vec_id IN (0, 7)").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    want = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in S.brute_force_topk_batch(emb, queries, k=4).collect()
    }
    got_map = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
    assert got_map == want

    rc = main([
        "--corpus", corpus_path, "--queries", qdir,
        "--sink", str(tmp_path / "sink-l"),
        "--checkpoint", str(tmp_path / "ckpt-l"), "--k", "4",
        "--index", "lsh", "--index-path", str(tmp_path / "idx"),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["index"] == "lsh" and rep["rows"] == 8
    lsh = spark.read.parquet(str(tmp_path / "sink-l") + "/data")
    per_q = {r["query_id"]: r["n"] for r in
             lsh.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert per_q == {0: 4, 7: 4}
    # the query vector itself lives in its own bucket → rank 1 = self
    self_hits = {r["query_id"]: r["vec_id"] for r in
                 lsh.where("rank = 1").collect()}
    assert self_hits == {0: 0, 7: 7}

    # third mode: the IVF cell-pruned batched path
    rc = main([
        "--corpus", corpus_path, "--queries", qdir,
        "--sink", str(tmp_path / "sink-i"),
        "--checkpoint", str(tmp_path / "ckpt-i"), "--k", "4",
        "--index", "ivf", "--index-path", str(tmp_path / "ividx"),
        "--ivf-cells", "8", "--nprobe", "3",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["index"] == "ivf" and rep["rows"] == 8
    ivf = spark.read.parquet(str(tmp_path / "sink-i") + "/data")
    # a query's own vector is always in a probed cell → rank 1 = self
    self_hits = {r["query_id"]: r["vec_id"] for r in
                 ivf.where("rank = 1").collect()}
    assert self_hits == {0: 0, 7: 7}


def test_clips_pipeline_missing_report(spark, tmp_path, capsys):
    """--missing-report: the ingest job's second (left-outer) query
    writes exactly the clips whose transcript never arrived, while the
    main windowed-rule query is unaffected."""
    from pyspark.sql import functions as F

    from jepl_spark.sources.clips import clips_df, transcripts_df
    from jobs.clips_pipeline import main

    n = 30
    a_dir, t_dir = str(tmp_path / "a"), str(tmp_path / "t")
    clips = clips_df(spark, n, step_s=0.05)
    clips.write.parquet(a_dir)
    # transcripts only for seq % 3 != 0; movers on both sides close
    # every real clip's match window by end of input
    trans = transcripts_df(spark, n, step_s=0.05, delay_s=1.0).where(
        "seq % 3 != 0")
    trans.write.parquet(t_dir)
    mover_a = clips.limit(1).withColumn(
        "event_time", F.lit("2031-01-01 00:00:00").cast("timestamp")
    ).withColumn("clip_id", F.lit("zz-mover"))
    mover_a.write.mode("append").parquet(a_dir)
    mover_t = transcripts_df(spark, 1).withColumn(
        "event_time", F.lit("2031-01-01 00:00:00").cast("timestamp")
    ).withColumn("clip_id", F.lit("zz-mover-t"))
    mover_t.write.mode("append").parquet(t_dir)

    rc = main([
        "--audio-path", a_dir, "--transcript-path", t_dir,
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--watermark", "5 seconds", "--max-delay", "10 seconds",
        "--missing-report", str(tmp_path / "missing"),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want_missing = {r["clip_id"] for r in clips.collect()
                    if r["seq"] % 3 == 0}
    assert rep["missing_transcripts"] >= len(want_missing)
    got = {r["clip_id"]
           for r in spark.read.parquet(str(tmp_path / "missing") + "/data")
           .collect() if r["clip_id"].startswith("clip-")}
    assert got == want_missing


def test_corpus_pipeline_fix_encoding_stage(spark, tmp_path, capsys):
    """--fix-encoding: mojibake repairs right after extraction, BEFORE
    exact dedup — a clean doc and its mojibake-corrupted twin become
    exact dupes only because the repair ran; the output carries the
    repaired text."""
    body = ("the quick brown fox jumps over the lazy dog near the "
            "river while the other animals watch the water flow")
    clean = body + " café — ok"
    moji = body + " cafÃ© â€” ok"
    docs = [(0, clean), (1, moji), (2, body + " other text")]
    src = str(tmp_path / "moji_docs")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(src)

    from jobs.corpus_pipeline import main

    out = str(tmp_path / "curated")
    rc = main([
        "--input", src, "--output", out,
        "--fix-encoding", "--min-tokens", "4",
        "--near-dup-threshold", "0.99",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    s = rep["stages"]
    assert s["input"] == 3
    assert s["after_exact_dedup"] == 2     # repaired twin deduped
    written = spark.read.parquet(out)
    texts = {r["doc_id"]: r["text"] for r in written.collect()}
    assert set(texts) == {0, 2}
    assert texts[0] == clean               # repaired == clean original


def test_audio_ingest_job(spark, tmp_path, capsys):
    """audio_ingest e2e: planted-dup synthetic corpus → exact-dedup +
    near-dedup admission → exactly the originals commit, with the
    fingerprint column persisted for snapshot reuse; the JSON summary
    reports admitted/dropped counts."""
    import json as _json

    from jobs.audio_ingest import main

    n = 70
    argv = [
        "--audio-path", str(tmp_path / "a"),
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--synthesize", str(n), "--plant-dups",
        "--exact-dedup-watermark", "1 hour",
    ]
    assert main(argv) == 0
    out = spark.read.parquet(str(tmp_path / "sink"))
    got = sorted(r["clip_id"] for r in out.select("clip_id").collect())
    want = sorted(f"clip-{i:012d}" for i in range(n) if i % 7 != 3)
    assert got == want
    assert "fp" in out.columns  # signatures persisted for reuse
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["admitted_clips"] == len(want)
    assert summary["dropped_clips"] == n - len(want)


def test_corpus_pipeline_nfc_and_epoch_mix(spark, tmp_path, capsys):
    """--nfc folds decomposed sequences before dedup; --epoch-weights
    materializes the mixture as the final stage with an epoch column."""
    import json as _json

    from jobs.corpus_pipeline import main

    rows = [
        (i, f"src{i % 2}", f"document body number {i} Café menu")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    inp = str(tmp_path / "in")
    df.write.parquet(inp)
    out = str(tmp_path / "out")
    rc = main([
        "--input", inp, "--output", out,
        "--nfc",
        "--epoch-weights", _json.dumps({"src0": 2.0, "src1": 0.5}),
        "--min-tokens", "1",
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    assert "epoch" in got.columns
    by = {r["source"]: r["count"]
          for r in got.groupBy("source").count().collect()}
    assert by["src0"] == 40              # 2.0 epochs of 20 docs
    assert 0 < by.get("src1", 0) < 20    # ~half of 20
    # NFC applied: no combining acute survives
    import unicodedata
    for r in got.select("text").limit(5).collect():
        assert "́" not in r["text"]
        assert "Café" in unicodedata.normalize("NFC", r["text"])


def test_corpus_pipeline_chunk_then_epoch_mix(spark, tmp_path):
    """--chunk-tokens + --epoch-weights must compose: the chunk stage
    carries 'source' through its projection so the final mixture
    stage can key on it (regression: it used to drop the column and
    die with an unresolved-column error)."""
    import json as _json

    from jobs.corpus_pipeline import main

    rows = [
        (i, f"src{i % 2}", " ".join(f"w{i}x{j}" for j in range(30)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    inp = str(tmp_path / "in")
    df.write.parquet(inp)
    out = str(tmp_path / "out")
    rc = main([
        "--input", inp, "--output", out,
        "--chunk-tokens", "8", "--chunk-overlap", "0",
        "--epoch-weights", _json.dumps({"src0": 2.0, "src1": 1.0}),
        "--min-tokens", "1",
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    assert {"epoch", "source", "chunk_idx"} <= set(got.columns)
    by = {r["source"]: r["count"]
          for r in got.groupBy("source").count().collect()}
    # 10 docs x 4 chunks per source; src0 doubled by the 2.0 epochs
    assert by["src0"] == 80 and by["src1"] == 40


def test_corpus_pipeline_substring_dedup_stage(spark, tmp_path, capsys):
    """--substring-dedup-k rewrites duplicated >=k-token runs out of
    surviving docs (Lee et al. policy) after doc-level dedup: the two
    docs sharing a 6-token license line keep their unique halves."""
    shared = "licensed under the apache license version two"
    docs = [
        (0, f"alpha beta gamma delta epsilon {shared}"),
        (1, f"{shared} zeta eta theta iota kappa"),
        (2, "a completely different document about the spark engine"),
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "clean")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(src)

    from jobs.corpus_pipeline import main

    rc = main([
        "--input", src, "--output", out,
        "--min-tokens", "3", "--max-punct-ratio", "0.9",
        "--near-dup-threshold", "0.9",
        "--substring-dedup-k", "4",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["stages"]["after_substring_dedup"] == 3
    got = {r["doc_id"]: r["text"] for r in
           spark.read.parquet(out).collect()}
    assert got[0] == "alpha beta gamma delta epsilon"
    assert got[1] == "zeta eta theta iota kappa"
    assert got[2] == "a completely different document about the spark engine"


def test_audio_ingest_quality_admission(spark, tmp_path, capsys):
    """--max-clipping-ratio/--max-silence-ratio reject exactly the
    planted defect set (clipped at i%11==4, silent at i%13==6,
    clipping precedence) before fingerprinting; survivors commit."""
    import json as _json

    from jobs.audio_ingest import main

    n = 80
    argv = [
        "--audio-path", str(tmp_path / "a"),
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--synthesize", str(n), "--plant-degraded",
        "--max-clipping-ratio", "0.05",
        "--max-silence-ratio", "0.9",
    ]
    assert main(argv) == 0
    out = spark.read.parquet(str(tmp_path / "sink"))
    got = sorted(r["clip_id"] for r in out.select("clip_id").collect())
    want = sorted(
        f"clip-{i:012d}" for i in range(n)
        if not (i % 11 == 4 or i % 13 == 6)
    )
    assert got == want
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["admitted_clips"] == len(want)


def test_audio_prep_job_full_chain(spark, tmp_path, capsys):
    """audio_prep e2e: trim → normalize → pair gate → chunk+align →
    time mask → duration-batch plan + shard manifest, per-stage counts
    in the report; chunk rows carry aligned transcript spans and the
    batch plan's ids are the re-keyed chunk ids."""
    import json as _json

    import numpy as np

    from jepl_spark.sources import audio as AU
    from jobs.audio_prep import main

    sr = 8000
    rows = []
    for i in range(30):
        n = sr * (800 + 37 * i) // 1000
        w = (0.4 * np.sin(np.arange(n) / 5.0) + 0.1).astype(np.float32)
        w[: sr // 5] = 0.0                   # 200 ms lead silence
        if i % 10 == 3:
            w[:] = 0.0                       # all silent -> trimmed away
        t = "" if i % 9 == 4 else " ".join(
            f"w{j}" for j in range(2 + i % 5))
        rows.append((f"clip-{i:04d}", AU.encode(w, "pcm16"), "pcm16",
                     sr, t))
    schema = ("clip_id string, bytes binary, codec string, "
              "sr_hz int, transcript string")
    inp = str(tmp_path / "clips")
    spark.createDataFrame(rows, schema).write.parquet(inp)

    out = str(tmp_path / "prep")
    rc = main([
        "--input", inp, "--output", out,
        "--trim-silence", "--normalize-dbfs", "-20.0",
        "--min-tps", "0.5", "--max-tps", "50.0",
        "--chunk-ms", "250", "--hop-ms", "250", "--min-tail-ms", "100",
        "--time-mask", "1", "--max-mask-ms", "50",
        "--batch-size", "4", "--bucket-ms", "250",
        "--shard-bytes", "65536",
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    s = rep["stages"]
    assert s["input"] == 30
    assert s["after_trim"] == 27             # the 3 all-silent die
    assert s["after_normalize"] == 27
    # empty transcripts (i%9==4, minus any all-silent overlap) reject
    assert s["after_pair_gate"] == 27 - len(
        [i for i in range(30) if i % 9 == 4 and i % 10 != 3])
    assert s["after_chunking"] > s["after_pair_gate"]  # windows multiply
    assert s["after_time_mask"] == s["after_chunking"]
    assert s["batches"] >= 1 and 0 <= s["padding_overhead"] < 1
    assert s["shards"] >= 1
    assert s["written"] == s["after_time_mask"]

    got = spark.read.parquet(out)
    # gain_db is a CLIP-level audit value; chunk rows don't carry it
    # (chunk_clips has a fixed output schema)
    assert {"chunk_text", "tok_start", "tok_end",
            "masks"} <= set(got.columns)
    r = got.where("chunk_idx = 0").limit(1).collect()[0]
    assert "#" in r["clip_id"]               # re-keyed chunk id
    plan = spark.read.parquet(out + "_batches")
    assert plan.count() == s["after_time_mask"]
    assert spark.read.parquet(out + "_shards").count() \
        == s["after_time_mask"]


def test_audio_prep_speed_perturb_and_guards(spark, tmp_path, capsys):
    """chunk + speed-perturb + mask compose (regression: ambiguous
    n_samples crash); masks are drawn per perturbed copy in the final
    timeline; --batch-size without any dur_ms source fails fast; a
    non-clip_id --id-col is rejected for audio stages."""
    import json as _json

    import numpy as np
    import pytest as _pt

    from jepl_spark.sources import audio as AU
    from jobs.audio_prep import main

    sr = 8000
    rows = [
        (f"c{i:02d}",
         AU.encode((0.4 * np.sin(np.arange(sr) / (4.0 + i)) + 0.1)
                   .astype(np.float32), "pcm16"),
         "pcm16", sr, f"tok{i} alpha beta")
        for i in range(6)
    ]
    inp = str(tmp_path / "clips")
    spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int, "
              "transcript string").write.parquet(inp)

    rc = main([
        "--input", inp, "--report-only",
        "--chunk-ms", "250", "--hop-ms", "250",
        "--speed-perturb", "--time-mask", "1", "--max-mask-ms", "40",
        "--batch-size", "4", "--bucket-ms", "100",
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    s = rep["stages"]
    assert s["after_chunking"] == 6 * 4
    assert s["after_speed_perturb"] == 3 * s["after_chunking"]
    assert s["after_time_mask"] == s["after_speed_perturb"]
    assert s["batches"] >= 1

    # no dur_ms anywhere -> fail fast, before any stage count
    nodur = str(tmp_path / "nodur")
    spark.createDataFrame(
        [("x", b"\x00\x00", "pcm16", sr)],
        "clip_id string, bytes binary, codec string, sr_hz int",
    ).write.parquet(nodur)
    with _pt.raises(SystemExit):
        main(["--input", nodur, "--report-only", "--batch-size", "4"])
    with _pt.raises(SystemExit):
        main(["--input", inp, "--report-only", "--id-col", "uid",
              "--trim-silence"])


def test_audio_ingest_one_sided_quality_flag(spark, tmp_path, capsys):
    """Giving ONLY --max-silence-ratio must not silently enable the
    clipping check at its library default: planted clipped clips
    (i%11==4) are admitted, silent ones (i%13==6) still reject
    (regression for the one-sided-flag behavior)."""
    from jobs.audio_ingest import main

    n = 80
    argv = [
        "--audio-path", str(tmp_path / "a"),
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--synthesize", str(n), "--plant-degraded",
        "--max-silence-ratio", "0.9",
    ]
    assert main(argv) == 0
    out = spark.read.parquet(str(tmp_path / "sink"))
    got = sorted(r["clip_id"] for r in out.select("clip_id").collect())
    want = sorted(
        f"clip-{i:012d}" for i in range(n) if i % 13 != 6
    )
    assert got == want


def test_audio_ingest_speech_rate_admission(spark, tmp_path, capsys):
    """--min-tps/--max-tps wire admit_paired_clips into the stream:
    the job admits exactly the pairs the batch operator admits (the
    operator itself is pinned by its oracle gates), and the bounds
    must actually reject something on this corpus."""
    import json as _json

    from pyspark.sql import functions as F

    from jepl_spark.functions.audio_udfs import admit_paired_clips
    from jepl_spark.sources.clips import clips_df
    from jobs.audio_ingest import main

    n = 60
    argv = [
        "--audio-path", str(tmp_path / "a"),
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--synthesize", str(n),
        "--min-tps", "2.5", "--max-tps", "40.0",
    ]
    assert main(argv) == 0
    out = spark.read.parquet(str(tmp_path / "sink"))
    got = sorted(r["clip_id"] for r in out.select("clip_id").collect())
    want = sorted(
        r["clip_id"]
        for r in admit_paired_clips(
            clips_df(spark, n), min_tps=2.5, max_tps=40.0
        ).where(F.col("reject_reason").isNull()).select("clip_id").collect()
    )
    assert 0 < len(want) < n          # the bounds bite on this corpus
    assert got == want
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["admitted_clips"] == len(want)

    import pytest as _pt
    with _pt.raises(SystemExit):
        main(argv[:-4] + ["--min-tps", "1.0"])   # must come as a pair

def test_audio_prep_trim_refreshes_dur_ms(spark, tmp_path, capsys):
    """--trim-silence on an input that carries dur_ms refreshes the
    column from the post-trim sample count (ADVICE r6): the batch plan
    and the written parquet must see trimmed durations, not the stale
    input metadata."""
    import json as _json

    import numpy as np

    from jepl_spark.sources import audio as AU
    from jobs.audio_prep import main

    sr = 8000
    rows = []
    for i in range(8):
        n = sr  # 1000 ms
        w = (0.4 * np.sin(np.arange(n) / 5.0) + 0.1).astype(np.float32)
        w[: sr // 2] = 0.0                    # 500 ms lead silence
        rows.append((f"c{i:02d}", AU.encode(w, "pcm16"), "pcm16",
                     sr, 1000))
    inp = str(tmp_path / "clips")
    spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int, "
              "dur_ms int").write.parquet(inp)

    out = str(tmp_path / "prep")
    rc = main(["--input", inp, "--output", out,
               "--trim-silence", "--batch-size", "4"])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"]["after_trim"] == 8

    got = spark.read.parquet(out)
    for r in got.select("dur_ms").collect():
        # 500 ms of lead silence cut -> dur_ms reflects the trim
        assert r.dur_ms <= 520, r.dur_ms
    plan = spark.read.parquet(out + "_batches")
    for r in plan.select("dur_ms").collect():
        assert r.dur_ms <= 520, r.dur_ms


def test_audio_ingest_offset_match(spark, tmp_path, capsys):
    """--near-dup-match offset routes ingest through the streaming
    trim-tolerant lane: planted lead/tail-trimmed copies (which the
    exact lane cannot see — duration changed) drop at ingest; exactly
    the originals commit."""
    import json as _json

    from jepl_spark.sources.clips import trim_dup_clips
    from jobs.audio_ingest import main

    inp = str(tmp_path / "clips")
    trim_dup_clips(spark, 40).write.parquet(inp)
    sink = str(tmp_path / "sink")
    rc = main([
        "--audio-path", inp, "--sink", sink,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--near-dup-match", "offset",
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = sorted(
        f"clip-{i:012d}" for i in range(40) if not (i % 7 == 3 and i > 0)
    )
    got = sorted(
        r.clip_id
        for r in spark.read.parquet(sink + "/data").collect()
    )
    assert got == want
    assert rep["admitted_clips"] == len(want)


def test_audio_prep_pack_stage(spark, tmp_path, capsys):
    """--pack-ms materializes whole-clip training examples with a
    byte-true manifest; every input clip lands in exactly one pack."""
    import json as _json

    from jobs.audio_prep import main

    inp = str(tmp_path / "clips")
    from jepl_spark.sources.clips import clips_df

    clips_df(spark, 40).write.parquet(inp)
    out = str(tmp_path / "prep")
    rc = main(["--input", inp, "--output", out, "--pack-ms", "3000"])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"]["packs"] >= 1
    packs = spark.read.parquet(out + "_packs")
    from pyspark.sql import functions as F

    n_manifest = packs.select(
        F.explode("manifest").alias("m")
    ).select("m.clip_id").distinct().count()
    assert n_manifest == 40


def test_audio_prep_logmel_stage(spark, tmp_path, capsys):
    """--logmel writes per-frame fbank features of the FINAL audio:
    frame counts match the framing formula on the post-trim waveforms,
    delta columns appear with --logmel-deltas, and a mixed-sample-rate
    corpus without --logmel-fmax fails fast (bin comparability)."""
    import json as _json

    import numpy as np
    import pytest as _pt

    from jepl_spark.functions.audio_udfs import logmel_frames
    from jepl_spark.sources import audio as AU
    from jobs.audio_prep import main

    sr = 8000
    rows = []
    for i in range(8):
        n = sr * (600 + 40 * i) // 1000
        w = (0.4 * np.sin(np.arange(n) / 5.0) + 0.1).astype(np.float32)
        w[: sr // 5] = 0.0  # 200 ms lead silence -> trim changes framing
        rows.append((f"clip-{i:04d}", AU.encode(w, "pcm16"), "pcm16", sr))
    schema = "clip_id string, bytes binary, codec string, sr_hz int"
    inp = str(tmp_path / "clips")
    spark.createDataFrame(rows, schema).write.parquet(inp)

    out = str(tmp_path / "prep")
    rc = main([
        "--input", inp, "--output", out,
        "--trim-silence",
        "--logmel", "8", "--logmel-cmvn", "--logmel-deltas",
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    feats = spark.read.parquet(out + "_features")
    assert {"clip_id", "sr_hz", "frame_idx", "feat", "delta",
            "delta2"} <= set(feats.columns)
    assert rep["stages"]["feature_frames"] == feats.count()

    # frame counts must reflect the TRIMMED audio, not the input
    written = {r["clip_id"]: r for r in
               spark.read.parquet(out).collect()}
    got = {r[0]: r[1] for r in feats.groupBy("clip_id").count().collect()}
    for cid, row in written.items():
        x = AU.decode(bytes(row["bytes"]), row["codec"])
        exp = logmel_frames(x, row["sr_hz"], 8, 25, 10, 0.0,
                            row["sr_hz"] / 2.0).shape[0]
        assert got[cid] == exp, (cid, got[cid], exp)

    # mixed-rate corpus without --logmel-fmax fails fast
    mixed = str(tmp_path / "mixed")
    spark.createDataFrame(
        rows[:2] + [("clip-16k", AU.encode(
            np.zeros(16000, dtype=np.float32) + 0.1, "pcm16"),
            "pcm16", 16000)],
        schema,
    ).write.parquet(mixed)
    with _pt.raises(SystemExit):
        main(["--input", mixed, "--output", str(tmp_path / "p2"),
              "--logmel", "8"])
    # ...and succeeds with a pinned fmax
    rc = main(["--input", mixed, "--output", str(tmp_path / "p3"),
               "--logmel", "8", "--logmel-fmax", "4000"])
    assert rc == 0
    # --resample canonicalizes the rate FIRST, so --logmel then needs
    # no fmax; the written clips are all at the target rate and the
    # same-rate rows passed bit-identical
    out4 = str(tmp_path / "p4")
    rc = main(["--input", mixed, "--output", out4,
               "--resample", "16000", "--logmel", "8",
               "--freq-mask", "1", "--freq-mask-bins", "3",
               "--mask-seed", "ep0"])
    assert rc == 0
    # the freq-masked bands are zero on every frame of a clip
    import hashlib as _hl

    f4 = spark.read.parquet(out4 + "_features")
    one = f4.where(f4.clip_id == "clip-0000").collect()
    assert one and "freq_masks" in f4.columns
    h = int(_hl.md5(b"ep0:clip-0000:0:F").hexdigest()[:15], 16)
    ln = 1 + h % 3
    st = int(_hl.md5(b"ep0:clip-0000:0:P").hexdigest()[:15], 16) \
        % max(1, 8 - ln + 1)
    for r in one:
        assert all(v == 0.0 for v in r["feat"][st:st + ln])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"]["after_resample"] == 3
    written = {r["clip_id"]: r for r in spark.read.parquet(out4).collect()}
    assert {r["sr_hz"] for r in written.values()} == {16000}
    # the already-16k row passed BIT-IDENTICAL
    b16 = AU.encode(np.zeros(16000, dtype=np.float32) + 0.1, "pcm16")
    assert bytes(written["clip-16k"]["bytes"]) == bytes(b16)
    for cid, b, _, _ in rows[:2]:
        # these were 8 kHz rows -> resampled, lengths double (±1)
        n_in = len(b) // 2
        n_out = len(bytes(written[cid]["bytes"])) // 2
        assert abs(n_out - 2 * n_in) <= 1, (cid, n_in, n_out)
