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
