"""Streaming golden-output fixtures (SURVEY.md §5): deterministic event
streams with pinned order/event-times/watermark, compared against the
Python oracle simulation; plus exactly-once sink idempotency,
checkpoint kill/resume, stream-stream join, session windows, and the
applyInPandasWithState lane."""

from __future__ import annotations

import math
import os
from datetime import timezone

import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from jepl_spark.lang.parser import parse_statement
from jepl_spark.streaming.engine import file_stream, run_rule_stream, run_to_completion
from jepl_spark.streaming.join import audio_transcript_join
from jepl_spark.streaming.listener import MetricsListener
from jepl_spark.streaming.sink import IdempotentParquetSink
from jepl_spark.streaming.state import stateful_windowed_agg
from jepl_spark.streaming.windows import windowed_select

from helpers import _group_key
from streaming_helpers import BASE, simulate_append_output, ts, write_batches

PA_SCHEMA = pa.schema(
    [
        pa.field("user", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("value", pa.float64()),
        pa.field("event_time", pa.timestamp("us", tz="UTC")),
    ]
)
SPARK_SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("kind", StringType()),
        StructField("value", DoubleType()),
        StructField("event_time", TimestampType()),
    ]
)


def _doc(user, kind, value, t):
    return {"user": user, "kind": kind, "value": value, "event_time": ts(t)}


def _sentinels(t0):
    return [
        [_doc("zz", "sentinel", 0.0, t0)],
        [_doc("zz", "sentinel", 0.0, t0 + 1)],
    ]


def _run_fixture(
    spark, tmp_path, batches, sql, *, window="30 seconds", window_s=30.0,
    slide=None, slide_s=None, watermark="10 seconds", delay_s=10.0,
):
    src = str(tmp_path / "src")
    write_batches(src, batches, PA_SCHEMA)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    q = run_rule_stream(
        sql,
        file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time",
        duration=window,
        slide=slide,
        watermark=watermark,
        sink=sink,
        checkpoint=str(tmp_path / "ckpt"),
    )
    run_to_completion(q)
    got = sink.read_committed(spark)
    return got


def _rows_to_map(stmt_text, rows, n_dims):
    stmt = parse_statement(stmt_text)
    out = {}
    for r in rows:
        vals = list(r)
        wstart = vals[0].replace(tzinfo=timezone.utc)
        rel = (wstart - BASE).total_seconds()
        dims = vals[2 : 2 + n_dims]
        key = _group_key(stmt, dims) if n_dims else str(stmt.condition)
        out[(rel, key)] = [float(v) for v in vals[2 + n_dims :]]
    return out


def _assert_matches(expected, got_map):
    assert set(got_map.keys()) == set(expected.keys()), (
        f"\n got={sorted(got_map)}\n exp={sorted(expected)}"
    )
    for k, vals in expected.items():
        assert len(vals) == len(got_map[k])
        for a, b in zip(vals, got_map[k]):
            assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (k, got_map[k], vals)


# ---------------------------------------------------------------------------


def test_tumbling_golden_grouped(spark, tmp_path):
    sql = (
        "select sum(value) AS s, count(value) AS n, avg(value) AS a "
        "from s where kind = 'click' group by user"
    )
    batches = [
        [
            _doc("u1", "click", 1.0, 1),
            _doc("u1", "view", 9.0, 2),
            _doc("u2", "click", 2.0, 31),
        ],
        [
            _doc("u1", "click", 4.0, 35),
            _doc("u2", "view", 8.0, 64),
            _doc("u1", "click", 16.0, 65),
        ],
        *_sentinels(1000),
    ]
    got = _run_fixture(spark, tmp_path, batches, sql)
    data_rows = [
        r
        for r in got.select("window_start", "window_end", "user", "s", "n", "a").collect()
        if r["user"] != "zz"
    ]
    expected = {
        k: v
        for k, v in simulate_append_output(
            sql, batches, ts_field="event_time", window_s=30.0, delay_s=10.0
        ).items()
        if "'sentinel'" not in k[1] and "zz" not in k[1]
    }
    # oracle docs carry datetime event_time; convert for the simulator
    _assert_matches(expected, _rows_to_map(sql, data_rows, 1))


def test_golden_invariant_across_parallelism(spark, tmp_path):
    """The same pinned fixture produces identical rows at two
    parallelism levels (shuffle/state partitions 1 vs 8) — byte-identical
    input, order-insensitive comparison (SURVEY.md §5)."""
    sql = ("select sum(value) AS s, count(value) AS n from s "
           "where value >= 0 group by user")
    batches = [
        [_doc("u1", "k", 1.0, 1), _doc("u2", "k", 2.0, 2), _doc("u1", "k", 4.0, 31)],
        *_sentinels(1000),
    ]
    results = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    for i, parts in enumerate(["1", "8"]):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            sub = tmp_path / f"p{parts}"
            sub.mkdir()
            got = _run_fixture(spark, sub, batches, sql)
            rows = sorted(
                (
                    str(r["window_start"]), r["user"], float(r["s"]), float(r["n"])
                )
                for r in got.select("window_start", "user", "s", "n").collect()
                if r["user"] != "zz"
            )
            results.append(rows)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results[0] == results[1] and len(results[0]) > 0


def test_late_data_dropped(spark, tmp_path):
    sql = "select count(value) AS n from s where value >= 0"
    batches = [
        [_doc("u1", "click", 1.0, 5), _doc("u1", "click", 1.0, 50)],
        [_doc("u1", "click", 1.0, 52)],
        # the late-row filter at batch 2 uses max ts through batch 0
        # (50-10=40 ≥ window end 30) → t=7 is dropped as too late
        [_doc("u1", "click", 1.0, 7), _doc("u1", "click", 1.0, 55)],
        *_sentinels(1000),
    ]
    got = _run_fixture(spark, tmp_path, batches, sql)
    rows = {
        (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds(): r["n"]
        for r in got.collect()
        if (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds() < 900
    }
    # [0,30): only t=5 (t=7 dropped late); [30,60): t=50,52,55
    assert rows == {0.0: 1.0, 30.0: 3.0}
    expected = simulate_append_output(
        sql, batches, ts_field="event_time", window_s=30.0, delay_s=10.0
    )
    sim = {k[0]: v[0] for k, v in expected.items() if k[0] < 900}
    assert sim == rows  # oracle simulation agrees with Spark


def test_sliding_golden(spark, tmp_path):
    sql = "select sum(value) AS s from s where kind != 'x'"
    batches = [
        [_doc("u1", "click", 1.0, 10), _doc("u1", "click", 2.0, 40)],
        [_doc("u1", "click", 4.0, 70)],
        *_sentinels(1000),
    ]
    got = _run_fixture(
        spark, tmp_path, batches, sql,
        window="60 seconds", window_s=60.0, slide="30 seconds", slide_s=30.0,
    )
    expected = {
        k: v
        for k, v in simulate_append_output(
            sql, batches, ts_field="event_time",
            window_s=60.0, delay_s=10.0, slide_s=30.0,
        ).items()
        if k[0] < 900
    }
    rows = [r for r in got.select("window_start", "window_end", "s").collect()
            if (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds() < 900]
    _assert_matches(expected, _rows_to_map(sql, rows, 0))


def test_exactly_once_sink_idempotent(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    df = spark.range(5).select(F.col("id"))
    sink.write_batch(df, 0)
    sink.write_batch(df, 0)  # replay → no-op
    sink.write_batch(df, 1)
    assert sink.committed_batches() == [0, 1]
    got = sink.read_committed(spark)
    assert got.count() == 10
    assert set(got.columns) >= {"id", "_lineage_partition", "_lineage_batch"}


def test_checkpoint_kill_resume(spark, tmp_path):
    """Stop after phase 1, add more files, resume from the same
    checkpoint: no duplicates, all data processed exactly once."""
    sql = "select count(value) AS n, sum(value) AS s from s where value > 0"
    src = str(tmp_path / "src")
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    ckpt = str(tmp_path / "ckpt")

    phase1 = [
        [_doc("u1", "click", 1.0, 1), _doc("u2", "click", 2.0, 2)],
        [_doc("u1", "click", 3.0, 31)],
    ]
    write_batches(src, phase1, PA_SCHEMA)
    q = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        sink=sink, checkpoint=ckpt,
    )
    run_to_completion(q)
    committed_after_1 = sink.committed_batches()

    # "kill": query finished; now new data arrives, resume same checkpoint
    phase2 = [
        [_doc("u2", "click", 5.0, 62)],
        *_sentinels(1000),
    ]
    # append with later mtimes
    import time as _t

    for i, docs in enumerate(phase2):
        write_batches(str(tmp_path / "stage2"), [docs], PA_SCHEMA)
        srcfile = os.path.join(str(tmp_path / "stage2"), "00000.parquet")
        dst = os.path.join(src, f"1{i:04d}.parquet")
        os.replace(srcfile, dst)
        os.utime(dst, (_t.time() + i, _t.time() + i))

    q2 = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        sink=sink, checkpoint=ckpt,
    )
    run_to_completion(q2)
    assert len(sink.committed_batches()) > len(committed_after_1)

    rows = {
        (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds():
        (r["n"], r["s"])
        for r in sink.read_committed(spark).collect()
        if (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds() < 900
    }
    # every window exactly once, with full counts across the restart
    assert rows == {0.0: (2.0, 3.0), 30.0: (1.0, 3.0), 60.0: (1.0, 5.0)}


def test_crash_mid_batch_replay_exactly_once(spark, tmp_path):
    """Inject a crash AFTER the batch's data files are written but
    BEFORE the commit marker lands: the restarted query replays the
    batch, overwrites the partial output, and commits exactly once."""
    sql = "select count(value) AS n from s where value > 0"
    src = str(tmp_path / "src")
    batches = [
        [_doc("u1", "k", 1.0, 1), _doc("u1", "k", 2.0, 2)],
        *_sentinels(1000),
    ]
    write_batches(src, batches, PA_SCHEMA)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))

    crash_on = {1}  # crash while committing batch 1 (first with output)

    def crashing_write(bdf, bid):
        if bid in crash_on and not sink.is_committed(bid):
            # write the data like the real sink, then die pre-marker
            import os as _os

            from jepl_spark.streaming.sink import add_lineage

            path = _os.path.join(sink.root, "data", f"batch={int(bid)}")
            add_lineage(bdf, bid).write.mode("overwrite").parquet(path)
            crash_on.discard(bid)
            raise RuntimeError("injected crash before commit marker")
        sink.write_batch(bdf, bid)

    q = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        foreach_batch=crashing_write, checkpoint=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="injected crash"):
        run_to_completion(q)

    # partial (uncommitted) output exists on disk but is invisible
    assert 1 not in sink.committed_batches()

    # restart from the same checkpoint → batch 1 replays
    q2 = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        foreach_batch=crashing_write, checkpoint=str(tmp_path / "ckpt"),
    )
    run_to_completion(q2)

    rows = {
        (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds(): r["n"]
        for r in sink.read_committed(spark).collect()
        if (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds() < 900
    }
    assert rows == {0.0: 2.0}  # exactly once, despite the partial write


def test_session_window_batch_semantics(spark):
    """Session windows (gap 10s): events ≤10s apart merge into one
    session; verified on a static frame (same plan shape as streaming)."""
    df = spark.createDataFrame(
        [
            ("u1", "click", 1.0, ts(0)),
            ("u1", "click", 2.0, ts(8)),     # merges (gap 8 < 10)
            ("u1", "click", 4.0, ts(30)),    # new session
            ("u2", "click", 8.0, ts(0)),
        ],
        schema=SPARK_SCHEMA,
    )
    out = windowed_select(
        "select sum(value) AS s, count(value) AS n from s where value > 0 group by user",
        df, ts_col="event_time", duration="unused", session_gap="10 seconds",
    )
    rows = {
        (r["user"], (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds()):
        (r["s"], r["n"])
        for r in out.collect()
    }
    assert rows == {
        ("u1", 0.0): (3.0, 2.0),
        ("u1", 30.0): (4.0, 1.0),
        ("u2", 0.0): (8.0, 1.0),
    }


def test_session_window_streaming_golden(spark, tmp_path):
    """Session windows over a real stream: gap-merged sessions emit once
    the watermark passes session end; session end = last event + gap."""
    src = str(tmp_path / "src")
    batches = [
        [_doc("u1", "k", 1.0, 0), _doc("u1", "k", 2.0, 8), _doc("u2", "k", 8.0, 3)],
        [_doc("u1", "k", 4.0, 40)],
        *_sentinels(1000),
    ]
    write_batches(src, batches, PA_SCHEMA)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    q = run_rule_stream(
        "select sum(value) AS s, count(value) AS n from s where value > 0 group by user",
        file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="unused", session_gap="10 seconds",
        watermark="5 seconds", sink=sink, checkpoint=str(tmp_path / "ckpt"),
    )
    run_to_completion(q)
    rows = {
        (r["user"],
         (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds(),
         (r["window_end"].replace(tzinfo=timezone.utc) - BASE).total_seconds()):
        (r["s"], r["n"])
        for r in sink.read_committed(spark)
        .select("window_start", "window_end", "user", "s", "n").collect()
        if r["user"] != "zz"
    }
    assert rows == {
        ("u1", 0.0, 18.0): (3.0, 2.0),   # t=0 and t=8 merge (gap 8 < 10)
        ("u2", 3.0, 13.0): (8.0, 1.0),
        ("u1", 40.0, 50.0): (4.0, 1.0),
    }


def test_stateful_applyinpandas_matches_builtin(spark, tmp_path):
    """applyInPandasWithState incremental aggregates equal the built-in
    windowed aggregation on the same stream."""
    src = str(tmp_path / "src")
    batches = [
        [_doc("u1", "k", 1.0, 1), _doc("u2", "k", 5.0, 4)],
        [_doc("u1", "k", 3.0, 33), _doc("u1", "k", -2.0, 35)],
        *_sentinels(1000),
    ]
    write_batches(src, batches, PA_SCHEMA)
    stream = file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1)
    out = stateful_windowed_agg(
        stream, ts_col="event_time", value_col="value",
        window_duration="30 seconds", dims=["user"], watermark="10 seconds",
    )
    collected = []

    def collect_batch(bdf, bid):
        collected.extend(bdf.collect())

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = {
        (r["user"], (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds()):
        (r["cnt"], r["sum"], r["avg"], r["min"], r["max"])
        for r in collected
        if r["user"] != "zz"
    }
    assert got == {
        ("u1", 0.0): (1, 1.0, 1.0, 1.0, 1.0),
        ("u2", 0.0): (1, 5.0, 5.0, 5.0, 5.0),
        ("u1", 30.0): (2, 1.0, 0.5, -2.0, 3.0),
    }


def test_stream_kmv_windowed_matches_batch_sketch(spark, tmp_path):
    """The bounded-state streaming KMV emits, per closed window, the
    IDENTICAL sorted k-min hash array the batch kmv_sketch computes
    over the same rows — including the k truncation on a window whose
    distinct count exceeds k."""
    from jepl_spark.operators import sketch as K

    def d(u, t):
        return {"doc_id": u, "text": f"u{u}", "event_time": ts(t)}

    # window [0,30): 12 distinct users (> k=8); window [30,60): 3
    batches = [
        [d(u, u % 20) for u in range(12)],
        [d(100 + u, 35 + u) for u in range(3)],
        [d(999, 4000)],  # watermark mover: closes both windows
        [d(998, 90000)],  # trailing flush sentinel
    ]
    src = str(tmp_path / "kmv-src")
    write_batches(src, batches, DEDUP_PA_SCHEMA)
    out = K.kmv_sketch_windowed_stateful(
        file_stream(spark, src, DEDUP_SPARK_SCHEMA, max_files_per_trigger=1),
        "doc_id", ts_col="event_time", duration="30 seconds",
        k=8, watermark="10 seconds",
    )
    collected = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: collected.extend(bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "kmv-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = {
        secs: (list(r["kmv"]), r["kmv_k"])
        for r in collected
        for secs in [
            (r["window_start"].replace(tzinfo=timezone.utc) - BASE)
            .total_seconds()
        ]
        if secs < 1000  # drop watermark-mover/sentinel windows
    }
    # batch twin over the same rows, bucketed the same way
    rows = [(u, t) for b in batches[:2] for u, t in
            [(x["doc_id"], x["event_time"]) for x in b]]
    batch = spark.createDataFrame(rows, "doc_id long, event_time timestamp")
    batch = batch.withColumn(
        "w", F.window("event_time", "30 seconds").getField("start"))
    want = {
        (r["w"].replace(tzinfo=timezone.utc) - BASE).total_seconds():
        (list(r["kmv"]), 8)
        for r in K.kmv_sketch(batch, "doc_id", k=8, group_by="w").collect()
    }
    assert got == want and len(want) == 2
    assert len(got[0.0][0]) == 8  # truncated at k
    assert len(got[30.0][0]) == 3  # exact below k


def test_stream_stream_join_golden(spark, tmp_path):
    """Audio × transcript streams joined on clip_id within the delay
    bound; result equals the equivalent batch join."""
    from jepl_spark.sources.clips import clips_df, transcripts_df

    n = 24
    audio_b = clips_df(spark, n).select("clip_id", "codec", "event_time", "seq")
    trans_b = transcripts_df(spark, n, delay_s=5.0)

    a_src, t_src = str(tmp_path / "a"), str(tmp_path / "t")
    audio_b.write.parquet(a_src)
    trans_b.write.parquet(t_src)

    a_stream = file_stream(spark, a_src, audio_b.schema)
    t_stream = file_stream(spark, t_src, trans_b.schema)
    joined = audio_transcript_join(
        a_stream, t_stream.drop("seq"),
        audio_watermark="30 seconds", transcript_watermark="30 seconds",
        max_delay="10 seconds",
    )
    collected = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: collected.extend(bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    assert len(collected) == n  # every clip matched exactly one transcript
    for r in collected:
        assert r["joined_transcript"].startswith("transcript ")
        assert (r["transcript_time"] - r["event_time"]).total_seconds() == 5.0


def test_stream_stream_left_outer_join_missing_transcripts(spark, tmp_path):
    """audio_transcript_join_outer: matched clips carry their
    transcript; clips whose transcript never arrives emit exactly one
    NULL-transcript row once the watermarks close the match window —
    the missing-transcript completeness report, from the same join
    state as the happy path."""
    from jepl_spark.sources.clips import clips_df, transcripts_df
    from jepl_spark.streaming.join import audio_transcript_join_outer

    n = 24
    audio_b = clips_df(spark, n).select("clip_id", "codec", "event_time", "seq")
    # transcripts only for even seq; odd clips must emit NULL rows
    trans_b = transcripts_df(spark, n, delay_s=5.0).where("seq % 2 = 0")
    # far-future watermark movers on BOTH sides so every outer state
    # row is provably unmatchable by end-of-stream
    amover = audio_b.limit(1).withColumn(
        "event_time", F.lit("2030-01-01 00:00:00").cast("timestamp")
    ).withColumn("clip_id", F.lit("zz-mover"))
    tmover = trans_b.limit(1).withColumn(
        "event_time", F.lit("2030-01-01 00:00:00").cast("timestamp")
    ).withColumn("clip_id", F.lit("zz-mover-t"))

    a_src, t_src = str(tmp_path / "a"), str(tmp_path / "t")
    audio_b.write.parquet(a_src)
    amover.write.mode("append").parquet(a_src)
    trans_b.write.parquet(t_src)
    tmover.write.mode("append").parquet(t_src)

    a_stream = file_stream(spark, a_src, audio_b.schema)
    t_stream = file_stream(spark, t_src, trans_b.schema)
    joined = audio_transcript_join_outer(
        a_stream, t_stream.drop("seq"),
        audio_watermark="10 seconds", transcript_watermark="10 seconds",
        max_delay="10 seconds",
    )
    collected = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: collected.extend(bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "ojckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    rows = [r for r in collected if not r["clip_id"].startswith("zz-mover")]
    assert len(rows) == n  # one row per clip, matched or not
    matched = {r["clip_id"] for r in rows if r["joined_transcript"] is not None}
    missing = {r["clip_id"] for r in rows if r["joined_transcript"] is None}
    want_matched = {r["clip_id"] for r in audio_b.collect() if r["seq"] % 2 == 0}
    assert matched == want_matched
    assert missing == {r["clip_id"] for r in audio_b.collect()} - want_matched
    for r in rows:
        if r["joined_transcript"] is None:
            assert r["transcript_time"] is None


def test_full_pipeline_join_window_golden(spark, tmp_path):
    """The complete north-rule pipeline as one streaming query —
    audio stream ⋈ transcript stream → windowed per-codec JEPL counts →
    exactly-once sink — against hand-computed expectations."""
    import pyarrow as pa

    from jepl_spark.sources.clips import clip_row

    n = 40
    audio_rows, trans_rows = [], []
    for i in range(n):
        c = clip_row(i)
        t = ts(10 * i)
        audio_rows.append(
            {"clip_id": c["clip_id"], "codec": c["codec"], "event_time": t}
        )
        trans_rows.append(
            {"clip_id": c["clip_id"], "transcript": c["transcript"],
             "event_time": ts(10 * i + 5)}
        )
    # sentinel pair far in the future closes all real windows
    audio_rows.append({"clip_id": "zz", "codec": "zz", "event_time": ts(10000)})
    trans_rows.append(
        {"clip_id": "zz", "transcript": "zz", "event_time": ts(10001)}
    )

    pa_audio = pa.schema(
        [pa.field("clip_id", pa.string()), pa.field("codec", pa.string()),
         pa.field("event_time", pa.timestamp("us", tz="UTC"))]
    )
    pa_trans = pa.schema(
        [pa.field("clip_id", pa.string()), pa.field("transcript", pa.string()),
         pa.field("event_time", pa.timestamp("us", tz="UTC"))]
    )
    write_batches(str(tmp_path / "a"), [audio_rows], pa_audio)
    write_batches(str(tmp_path / "t"), [trans_rows], pa_trans)

    from pyspark.sql.types import StructType, StructField, StringType, TimestampType

    s_audio = StructType([
        StructField("clip_id", StringType()), StructField("codec", StringType()),
        StructField("event_time", TimestampType()),
    ])
    s_trans = StructType([
        StructField("clip_id", StringType()), StructField("transcript", StringType()),
        StructField("event_time", TimestampType()),
    ])

    a = file_stream(spark, str(tmp_path / "a"), s_audio)
    t = file_stream(spark, str(tmp_path / "t"), s_trans)
    joined = audio_transcript_join(
        a, t, audio_watermark="30 seconds", transcript_watermark="30 seconds",
        max_delay="10 seconds",
    )
    agg = windowed_select(
        "select count(clip_id) AS n from joined where codec != 'zz' group by codec",
        joined, ts_col="event_time", duration="60 seconds", watermark=None,
    )
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)

    got = {}
    for r in sink.read_committed(spark).select(
        "window_start", "codec", "n"
    ).collect():
        w = (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds()
        if w < 9000:
            got[(w, r["codec"])] = r["n"]

    # hand-computed expectation: every clip joins its transcript (+5s ≤
    # 10s delay bound); per-codec counts per 60s window; ALL real
    # windows closed by the sentinel; zz groups emit n=0 rows for
    # windows where only zz rows exist — none below 9000s
    expected = {}
    for i in range(n):
        w = (10 * i // 60) * 60.0
        codec = clip_row(i)["codec"]
        expected[(w, codec)] = expected.get((w, codec), 0) + 1
    assert got == {k: float(v) for k, v in expected.items()}, (got, expected)


def test_metrics_listener(spark, tmp_path):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        sql = "select count(value) AS n from s where value > 0"
        batches = [[_doc("u1", "k", 1.0, 1)], *_sentinels(500)]
        _run_fixture(spark, tmp_path, batches, sql)
        # progress events ride the async listener bus and can lag the
        # query's completion under load — poll with a deadline
        import time as _time

        deadline = _time.time() + 30
        while True:
            summary = listener.summary()
            if summary["batches"] >= 1 and summary["input_rows"] >= 3:
                break
            if _time.time() > deadline:
                break
            _time.sleep(0.5)
        assert summary["batches"] >= 1
        assert summary["input_rows"] >= 3
    finally:
        spark.streams.removeListener(listener)


def test_iceberg_sink_protocol(spark, monkeypatch):
    """Protocol-level test of IcebergSink (DESIGN-ONLY lane — no
    Iceberg runtime in this sandbox, see COVERAGE.md): a replayed
    committed batch must be a no-op; an uncommitted batch must append
    exactly once with the batch id stamped both as a snapshot property
    (the idempotency key) and as a lineage column."""
    from unittest.mock import MagicMock

    from jepl_spark.streaming.sink import IcebergSink

    writes = []

    def fake_write_to(self, table):
        m = MagicMock()
        m.option.return_value = m
        writes.append((self, table, m))
        return m

    sink = IcebergSink("cat.db.metrics")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    # patch the CONCRETE DataFrame class (Spark 4 classic subclass
    # overrides writeTo; patching the abstract base has no effect)
    monkeypatch.setattr(type(df), "writeTo", fake_write_to, raising=False)

    # replay of an already-committed batch → no write at all
    monkeypatch.setattr(IcebergSink, "is_committed", lambda self, s, b: True)
    sink.write_batch(df, 7)
    assert writes == []

    # uncommitted batch → exactly one append, keyed and lineage-stamped
    monkeypatch.setattr(IcebergSink, "is_committed", lambda self, s, b: False)
    sink.write_batch(df, 7)
    assert len(writes) == 1
    written_df, table, m = writes[0]
    assert table == "cat.db.metrics"
    m.option.assert_called_once_with("snapshot-property.jepl.batch_id", "7")
    m.append.assert_called_once_with()
    lineage = {r["_lineage_batch"] for r in written_df.select("_lineage_batch").collect()}
    assert lineage == {7}


def test_sink_scheme_handling(spark, tmp_path):
    """Marker I/O goes through the Hadoop FS API: an explicit file://
    URI must work end-to-end (the scheme-ful code path HDFS would
    take), and object-store schemes whose rename is not atomic must be
    rejected at construction."""
    import pytest as _pytest

    from jepl_spark.streaming.sink import IdempotentParquetSink

    for scheme in ("s3a", "gs", "abfss"):
        with _pytest.raises(ValueError, match="atomic rename"):
            IdempotentParquetSink(f"{scheme}://bucket/out")

    sink = IdempotentParquetSink(f"file://{tmp_path}/sink")
    df = spark.createDataFrame([(1, 2.0)], ["k", "v"])
    sink.write_batch(df, 0)
    sink.write_batch(df, 0)  # replay → no-op (single committed batch)
    assert sink.committed_batches(spark) == [0]
    out = sink.read_committed(spark)
    assert out.count() == 1 and set(out.columns) >= {"k", "v", "_lineage_batch"}


def test_randomized_streaming_parity(spark, tmp_path):
    """Randomized streaming fixtures (random batches / event times /
    values / rules) vs the append-emission simulator — the streaming
    analogue of the batch property fuzz.  Seeded for determinism."""
    import random

    rng = random.Random(424242)
    rules = [
        "select sum(value) AS s, count(value) AS n from s where kind = 'click' group by user",
        "select count(value) AS n from s where value > 3 OR kind = 'view'",
        "select max(value) AS mx, min(value) AS mn from s where kind != 'error' group by user",
    ]
    for case in range(3):
        sql = rules[case]
        batches = []
        t = 0.0
        for _ in range(rng.randrange(2, 5)):
            batch = []
            for _ in range(rng.randrange(2, 7)):
                t += rng.uniform(0.5, 20.0)
                batch.append(_doc(
                    f"u{rng.randrange(3)}",
                    rng.choice(["click", "view", "error"]),
                    float(rng.randrange(0, 9)),
                    t,
                ))
            batches.append(batch)
        batches.extend(_sentinels(t + 1000))
        sub = tmp_path / f"case{case}"
        sub.mkdir()
        got = _run_fixture(spark, sub, batches, sql)
        stmt = parse_statement(sql)
        n_dims = len(stmt.dimensions)
        cols = ["window_start", "window_end"] + (["user"] if n_dims else [])
        agg_cols = stmt.column_names()  # exactly the rule's fields
        rows = [
            r for r in got.select(*cols, *agg_cols).collect()
            if (not n_dims) or r["user"] != "zz"
        ]
        expected = {
            k: v
            for k, v in simulate_append_output(
                sql, batches, ts_field="event_time", window_s=30.0, delay_s=10.0
            ).items()
            if "zz" not in k[1] and "'sentinel'" not in k[1]
        }
        if not n_dims:
            # sentinel rows fold into the same (ungrouped) key — drop
            # windows past the data horizon instead
            horizon = t + 900
            expected = {k: v for k, v in expected.items() if k[0] < horizon}
            rows = [
                r for r in rows
                if (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds() < horizon
            ]
        _assert_matches(expected, _rows_to_map(sql, rows, n_dims))


def test_randomized_sliding_window_parity(spark, tmp_path):
    """Randomized SLIDING-window streaming fixture vs the simulator
    (the randomized test above covers tumbling only)."""
    import random

    rng = random.Random(99)
    sql = "select sum(value) AS s, count(value) AS n from s where value >= 1"
    batches = []
    t = 0.0
    for _ in range(3):
        batch = []
        for _ in range(rng.randrange(3, 7)):
            t += rng.uniform(1.0, 25.0)
            batch.append(_doc("u1", "k", float(rng.randrange(0, 7)), t))
        batches.append(batch)
    batches.extend(_sentinels(t + 1000))
    got = _run_fixture(
        spark, tmp_path, batches, sql,
        window="60 seconds", window_s=60.0, slide="30 seconds", slide_s=30.0,
    )
    horizon = t + 900
    rows = [
        r for r in got.select("window_start", "window_end", "s", "n").collect()
        if (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds() < horizon
    ]
    expected = {
        k: v
        for k, v in simulate_append_output(
            sql, batches, ts_field="event_time",
            window_s=60.0, delay_s=10.0, slide_s=30.0,
        ).items()
        if k[0] < horizon
    }
    _assert_matches(expected, _rows_to_map(sql, rows, 0))


DEDUP_PA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("text", pa.string()),
        pa.field("event_time", pa.timestamp("us", tz="UTC")),
    ]
)
DEDUP_SPARK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("event_time", TimestampType()),
    ]
)


def test_stream_exact_dedup_watermark_bounded(spark, tmp_path):
    """VERDICT r2 item 4, the semantics the gate cannot pin: a duplicate
    inside the watermark horizon is dropped even ACROSS batches, while
    a duplicate arriving after its original's state was evicted is
    re-emitted (bounded-state contract) — and normalization folds
    case/whitespace variants into one hash."""
    from jepl_spark.operators.dedup import stream_exact_dedup

    def d(i, text, t):
        return {"doc_id": i, "text": text, "event_time": ts(t)}

    batches = [
        [d(0, "alpha beta gamma", 0), d(1, "other content here", 1)],
        [d(2, "Alpha  BETA gamma", 5)],        # dup of 0 modulo norm, in horizon
        [d(3, "watermark mover", 4000)],       # advances watermark past 0+delay
        [d(6, "watermark spacer", 4001)],      # eviction wm lags one batch (i-1)
        [d(4, "alpha beta gamma", 3995)],      # 0's state evicted -> re-emitted
        [d(5, "far future flush", 90000)],
    ]
    src = str(tmp_path / "src")
    write_batches(src, batches, DEDUP_PA_SCHEMA)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    stream = file_stream(spark, src, DEDUP_SPARK_SCHEMA, max_files_per_trigger=1)
    out = stream_exact_dedup(stream, ts_col="event_time", watermark="10 seconds")
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    rows = sink.read_committed(spark).select("doc_id").collect()
    got = sorted(r["doc_id"] for r in rows)
    # 2 deduped (same hash as 0, within horizon); 4 re-emitted (state
    # for 0 evicted once the watermark passed 0s + 10s)
    assert got == [0, 1, 3, 4, 5, 6], got


def test_stream_exact_dedup_unbounded_mode(spark, tmp_path):
    """ts_col=None: plain dropDuplicates — exact-forever state, dups
    dropped regardless of distance."""
    from jepl_spark.operators.dedup import stream_exact_dedup

    def d(i, text, t):
        return {"doc_id": i, "text": text, "event_time": ts(t)}

    batches = [
        [d(0, "alpha beta", 0)],
        [d(1, "alpha beta", 50000)],   # far away, still deduped
        [d(2, "fresh text", 50001)],
    ]
    src = str(tmp_path / "src")
    write_batches(src, batches, DEDUP_PA_SCHEMA)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    stream = file_stream(spark, src, DEDUP_SPARK_SCHEMA, max_files_per_trigger=1)
    q = (
        stream_exact_dedup(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = sorted(r["doc_id"] for r in sink.read_committed(spark).collect())
    assert got == [0, 2], got


# -- streaming SimHash near-dup dedup ---------------------------------------

SIG_PA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("s", pa.int64()),
        pa.field("event_time", pa.timestamp("us", tz="UTC")),
    ]
)
SIG_SPARK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("s", LongType()),
        StructField("event_time", TimestampType()),
    ]
)


def _run_simhash_dedup(spark, tmp_path, name="run"):
    """Two-batch planted-signature fixture; returns (sink, run) where
    run() executes availableNow against the shared checkpoint."""
    from jepl_spark.operators.dedup import stream_simhash_near_dedup

    A = 0
    B = (1 << 40) | (1 << 30) | (1 << 20) | (1 << 10) | 1  # 5 bits from A
    C = (1 << 50) | (1 << 45) | (1 << 35) | (1 << 25) | (1 << 15)

    def d(i, s, t):
        return {"doc_id": i, "s": s, "event_time": ts(t)}

    batches = [
        # in-batch near pair: B|2 has hamming 1 from B and is LARGER →
        # dropped; A↔B hamming 5 > 3 → both kept
        [d(0, A, 0), d(1, B, 1), d(2, B | 2, 2)],
        # vs admitted: A|4 (hamming 1 of committed A) dropped even
        # though larger; B exact repeat dropped by stage-1 state;
        # C kept; C|1 dropped in-batch (larger near-neighbor of C)
        [d(3, A | 4, 10), d(4, B, 11), d(5, C, 12), d(6, C | 1, 13)],
    ]
    src = str(tmp_path / f"{name}-src")
    write_batches(src, batches, SIG_PA_SCHEMA)
    sink = IdempotentParquetSink(str(tmp_path / f"{name}-sink"))
    prepared, fb = stream_simhash_near_dedup(
        file_stream(spark, src, SIG_SPARK_SCHEMA, max_files_per_trigger=1),
        sink,
        ts_col="event_time",
        watermark="1 hour",
        max_hamming=3,
        bands=4,
        sig=F.col("s"),
    )

    def run():
        q = (
            prepared.writeStream.outputMode("append")
            .foreachBatch(fb)
            .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)

    return sink, run, (A, B, C)


def test_stream_simhash_near_dedup_multibatch(spark, tmp_path):
    """Cross-batch semantics the single-batch gate cannot pin: admitted
    signatures drop later near-arrivals in BOTH directions (any
    neighbor), in-batch drops go by signature order, and exact repeats
    die in stage-1 state."""
    sink, run, (A, B, C) = _run_simhash_dedup(spark, tmp_path)
    run()
    got = sorted(r["s"] for r in sink.read_committed(spark).collect())
    assert got == sorted([A, B, C]), got
    ids = sorted(r["doc_id"] for r in sink.read_committed(spark).collect())
    assert ids == [0, 1, 5]


def test_stream_simhash_near_dedup_restart_idempotent(spark, tmp_path):
    """Re-running over the same checkpoint adds nothing; a manual
    replay of a committed batch id is a no-op before any work."""
    sink, run, (A, B, C) = _run_simhash_dedup(spark, tmp_path, name="rr")
    run()
    first = sorted(tuple(r) for r in sink.read_committed(spark).collect())
    n_batches = sink.committed_count(spark)
    run()  # resume from checkpoint: no new input → no new commits
    assert sorted(tuple(r) for r in sink.read_committed(spark).collect()) == first
    assert sink.committed_count(spark) == n_batches

    # replay of an already-committed batch id short-circuits: feed a
    # frame that WOULD change the output if processed
    from jepl_spark.operators.dedup import stream_simhash_near_dedup

    poison = spark.createDataFrame(
        [(99, 12345, ts(99))], SIG_SPARK_SCHEMA
    ).withColumn("simhash", F.col("s"))
    _, fb2 = stream_simhash_near_dedup(
        file_stream(spark, str(tmp_path / "rr-src"), SIG_SPARK_SCHEMA),
        sink, ts_col="event_time", sig=F.col("s"),
    )
    fb2(poison, 0)  # batch 0 already committed
    assert sorted(tuple(r) for r in sink.read_committed(spark).collect()) == first


def test_stream_decontaminate_broadcast_path_live(spark, tmp_path):
    """The >2048-word (broadcast single-row stream-static cross join)
    word-array binding on a REAL writeStream query — the default
    n_bits=1<<20 configuration routes here, but the live gate uses the
    64-word literal path, so this pins that Spark actually accepts the
    cross join end-to-end and drops/keeps the same rows the batch
    projection does."""
    import pyarrow as pa

    from jepl_spark.operators import dedup as D

    bench_text = "the quick brown fox jumps over the lazy dog every day"
    rows = [
        {"doc_id": 0,
         "text": f"intro words then {bench_text} and some trailing text"},
        {"doc_id": 1,
         "text": "a completely unrelated document about spark shuffles "
                 "and partition pruning strategies for large joins"},
        {"doc_id": 2, "text": None},
    ]
    pa_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("text", pa.string())]
    )
    src = str(tmp_path / "src")
    write_batches(src, [rows[:2], rows[2:]], pa_schema)

    bench = spark.createDataFrame([(bench_text,)], ["text"])
    filt = D.decontaminate_bloom_words(bench, n=8)  # default 1<<20 bits
    assert len(filt.words) > 2048  # must exercise the broadcast binding

    docs_schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    kept = D.stream_decontaminate(
        file_stream(spark, src, docs_schema, max_files_per_trigger=1),
        filt, min_hits=2, hits_col="h",
    )
    assert kept.isStreaming
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    q = (
        kept.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: sink.write_batch(df, bid))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = {r["doc_id"]: r["h"] for r in sink.read_committed(spark).collect()}
    # contaminated doc 0 dropped; unrelated + NULL kept with 0 hits
    assert got == {1: 0, 2: 0}
    # and the helper word-array column never leaks into the output
    # (the sink adds its own _lineage_* columns)
    cols = set(sink.read_committed(spark).columns)
    assert {"doc_id", "text", "h"} <= cols
    assert not any(c.startswith("__bloom_words") for c in cols)


def test_stream_simhash_horizon_defaults_to_watermark(spark, tmp_path):
    """The vs-admitted read is bounded by default: horizon_s='watermark'
    resolves to the dedup watermark delay, so an admitted near-neighbor
    OLDER than (batch's earliest event - watermark) is no longer
    consulted — its near-dup re-admits (the documented recall trade,
    matching the exact-dedup state bound).  horizon_s=None restores the
    full-history scan and drops that same near-dup."""
    from jepl_spark.operators.dedup import (
        _interval_seconds, stream_simhash_near_dedup,
    )

    assert _interval_seconds("1 hour") == 3600
    assert _interval_seconds("90 seconds") == 90
    assert _interval_seconds("1 hour 30 minutes") == 5400
    assert _interval_seconds("100 milliseconds") == 1  # rounds UP
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _interval_seconds("3 fortnights")
    with _pytest.raises(ValueError):
        stream_simhash_near_dedup(None, None, horizon_s="bogus")

    A = 0
    NEAR_A = 1  # hamming 1 from A

    def batches_for(name):
        src = str(tmp_path / f"{name}-src")
        write_batches(
            src,
            [
                [{"doc_id": 0, "s": A, "event_time": ts(0)}],
                # arrives 2 hours later — beyond the 1-hour watermark
                [{"doc_id": 1, "s": NEAR_A, "event_time": ts(7200)}],
            ],
            SIG_PA_SCHEMA,
        )
        return src

    def run(name, **kw):
        sink = IdempotentParquetSink(str(tmp_path / f"{name}-sink"))
        prepared, fb = stream_simhash_near_dedup(
            file_stream(spark, batches_for(name), SIG_SPARK_SCHEMA,
                        max_files_per_trigger=1),
            sink, ts_col="event_time", watermark="1 hour",
            max_hamming=3, bands=4, sig=F.col("s"), **kw,
        )
        q = (
            prepared.writeStream.outputMode("append")
            .foreachBatch(fb)
            .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)
        return sorted(r["s"] for r in sink.read_committed(spark).collect())

    # default horizon = watermark (3600 s) < 7200 s gap → A not read
    # back → NEAR_A re-admits
    assert run("hdef") == [A, NEAR_A]
    # explicit full-history scan → NEAR_A dropped against admitted A
    assert run("hnone", horizon_s=None) == [A]


def test_stream_windowed_topk_trending(spark, tmp_path):
    """Per-window top-k on a live stream: counts accumulate across
    micro-batches within a window, the rank applies once at window
    close (ties break count desc / key asc), and k cuts the tail."""
    from jepl_spark.operators.stats import stream_windowed_topk

    def e(u, t):
        return {"user": u, "kind": "x", "value": 1.0, "event_time": ts(t)}

    batches = [
        # window [0,30): a=3, b=2, c=2, d=1 — spread over two batches
        [e("a", 1), e("a", 2), e("b", 3), e("c", 4)],
        [e("a", 5), e("b", 6), e("c", 7), e("d", 8)],
        # watermark mover closes the window
        [e("z", 1000)],
    ]
    src = str(tmp_path / "src")
    write_batches(src, batches, PA_SCHEMA)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    counts, fb = stream_windowed_topk(
        file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        "user", sink, ts_col="event_time", duration="30 seconds", k=3,
        watermark="10 seconds",
    )
    q = (
        counts.writeStream.outputMode("append")
        .foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    rows = [
        r for r in sink.read_committed(spark).collect()
        if (r["window_start"].replace(tzinfo=timezone.utc) - BASE)
        .total_seconds() < 1000
    ]
    got = sorted((r["rank"], r["user"], r["cnt"]) for r in rows)
    # b beats c on the asc key tiebreak at equal counts; d is cut by k
    assert got == [(1, "a", 3), (2, "b", 2), (3, "c", 2)]


# -- ManifestCommitSink: the rename-free exactly-once matrix ---------------


def test_manifest_sink_idempotent(spark, tmp_path):
    from jepl_spark.streaming.sink import ManifestCommitSink

    sink = ManifestCommitSink(str(tmp_path / "msink"))
    df = spark.range(5).select(F.col("id"))
    sink.write_batch(df, 0)
    sink.write_batch(df, 0)  # replay → no-op
    sink.write_batch(df, 1)
    assert sink.committed_batches() == [0, 1]
    got = sink.read_committed(spark)
    assert got.count() == 10
    assert set(got.columns) >= {"id", "_lineage_partition", "_lineage_batch"}
    # two commits → manifest v1, v2; replay did NOT publish a version
    assert sink.current_manifest(spark)["version"] == 2


def test_manifest_sink_crash_before_manifest_put(spark, tmp_path):
    """Crash AFTER the attempt's data files are fully written but BEFORE
    the manifest PUT: the files are orphans (invisible to readers), the
    replay commits a fresh attempt exactly once, and orphan_files()
    reports the dead attempt for vacuuming."""
    from jepl_spark.streaming.sink import ManifestCommitSink, add_lineage

    sink = ManifestCommitSink(str(tmp_path / "msink"))
    df = spark.range(7).select(F.col("id"))

    # simulate the first (crashing) attempt: data written, no manifest
    dead_dir = os.path.join(sink.root, "data", "batch=0", "attempt=deadbeef")
    add_lineage(df, 0).write.mode("error").parquet(dead_dir)
    assert sink.committed_batches() == []
    with pytest.raises(ValueError, match="no committed batches"):
        sink.read_committed(spark)

    # the replay (what foreachBatch does on restart)
    sink.write_batch(df, 0)
    assert sink.committed_batches() == [0]
    assert sink.read_committed(spark).count() == 7  # not 14: orphans invisible
    orphans = sink.orphan_files(spark)
    assert orphans and all("attempt=deadbeef" in p for p in orphans)


def test_manifest_sink_last_writer_wins_deterministic(spark, tmp_path):
    """Two same-version manifests (the zombie-writer race): every reader
    picks the SAME winner — max (version, name) — and sees a consistent
    exactly-once view (one attempt's files, never a mix)."""
    import json as _json

    from jepl_spark import fsutil
    from jepl_spark.streaming.sink import ManifestCommitSink

    sink = ManifestCommitSink(str(tmp_path / "msink"), lineage=False)
    df_a = spark.range(3).select(F.col("id"))
    df_b = spark.range(100, 105).select(F.col("id"))

    # attempt A commits batch 0 normally (v1)
    sink.write_batch(df_a, 0)
    man_a = sink.current_manifest(spark)

    # zombie attempt B races the same version with different files
    dir_b = os.path.join(sink.root, "data", "batch=0", "attempt=zzzz")
    df_b.write.mode("error").parquet(dir_b)
    files_b = sink._list_parquet(spark, dir_b)
    man_b = {"version": 1, "batches": {"0": files_b}, "ts": 0}
    fsutil.write_text(
        spark,
        os.path.join(sink.root, "_manifests", "v000000000001-zzzz.json"),
        _json.dumps(man_b),
    )

    got = sink.current_manifest(spark)
    assert got["version"] == 1
    # 'zzzz' sorts after attempt A's uuid with probability ~1; assert the
    # tie-break picked exactly one attempt's files, not a mix
    assert got["batches"]["0"] in (man_a["batches"]["0"], files_b)
    n = sink.read_committed(spark).count()
    assert n in (3, 5)  # one consistent view
    # and every fresh reader agrees
    assert ManifestCommitSink(sink.root).current_manifest(spark) == got


def test_manifest_sink_three_writer_fork_converges(spark, tmp_path):
    """N>2 concurrent-writer matrix (docstring fault matrix): three
    writers fork the version chain; every reader still elects one
    self-contained winner, and a batch committed only on a losing fork
    is re-committed by the legitimate writer's replay (is_committed is
    false for it), converging the chain."""
    from jepl_spark.streaming.sink import ManifestCommitSink

    root = str(tmp_path / "msink")
    w1 = ManifestCommitSink(root, lineage=False)
    w2 = ManifestCommitSink(root, lineage=False)
    w3 = ManifestCommitSink(root, lineage=False)

    w1.write_batch(spark.range(0, 3).select(F.col("id")), 0)      # v1
    # zombie w2, stale view: commits batch 1 building on v1 → v2
    w2.write_batch(spark.range(10, 14).select(F.col("id")), 1)    # v2 (fork A)
    # zombie w3 also saw v1... but by now LIST shows v2; it builds v3
    # with its own batch-1 attempt — a diverged chain ahead of fork A
    w3.write_batch(spark.range(20, 25).select(F.col("id")), 1)    # replay→no-op
    man = w3.current_manifest(spark)
    assert man["version"] == 2  # w3 saw batch 1 committed → no-op

    # force a real fork: hand-publish a v3 that DROPS batch 1 (a
    # zombie that built on v1, never having listed v2)
    import json as _json

    from jepl_spark import fsutil

    v1_files = {"0": man["batches"]["0"]}
    fsutil.write_text(
        spark,
        os.path.join(root, "_manifests", "v000000000003-zzzz.json"),
        _json.dumps({"version": 3, "batches": v1_files, "ts": 0}),
    )
    # every fresh reader elects the same winner (the fork, v3) and sees
    # a consistent view: batch 0 only
    for w in (w1, w2, w3):
        got = w.current_manifest(spark)
        assert got["version"] == 3 and set(got["batches"]) == {"0"}
    assert sorted(r["id"] for r in w1.read_committed(spark).collect()) == [0, 1, 2]

    # lost update heals: batch 1 is not committed on the winner, so the
    # legitimate writer's checkpoint replay re-commits it → v4 carries
    # both batches and all readers converge
    assert not w1.is_committed(1)
    w1.write_batch(spark.range(10, 14).select(F.col("id")), 1)
    healed = w1.current_manifest(spark)
    assert healed["version"] == 4 and set(healed["batches"]) == {"0", "1"}
    got = sorted(r["id"] for r in w1.read_committed(spark).collect())
    assert got == [0, 1, 2, 10, 11, 12, 13]
    # losing-fork attempts are now orphans, reclaimable
    assert w1.orphan_files(spark)


def test_manifest_sink_checkpoint_kill_resume(spark, tmp_path):
    """The kill/resume matrix on the rename-free sink: same checkpoint,
    new data after restart, every window exactly once."""
    from jepl_spark.streaming.sink import ManifestCommitSink

    sql = "select count(value) AS n, sum(value) AS s from s where value > 0"
    src = str(tmp_path / "src")
    sink = ManifestCommitSink(str(tmp_path / "msink"))
    ckpt = str(tmp_path / "ckpt")

    phase1 = [
        [_doc("u1", "click", 1.0, 1), _doc("u2", "click", 2.0, 2)],
        [_doc("u1", "click", 3.0, 31)],
    ]
    write_batches(src, phase1, PA_SCHEMA)
    q = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        foreach_batch=sink.foreach_batch(), checkpoint=ckpt,
    )
    run_to_completion(q)
    committed_after_1 = sink.committed_batches()

    phase2 = [
        [_doc("u2", "click", 5.0, 62)],
        *_sentinels(1000),
    ]
    import time as _t

    for i, docs in enumerate(phase2):
        write_batches(str(tmp_path / "stage2"), [docs], PA_SCHEMA)
        srcfile = os.path.join(str(tmp_path / "stage2"), "00000.parquet")
        dst = os.path.join(src, f"1{i:04d}.parquet")
        os.replace(srcfile, dst)
        os.utime(dst, (_t.time() + i, _t.time() + i))

    q2 = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        foreach_batch=sink.foreach_batch(), checkpoint=ckpt,
    )
    run_to_completion(q2)
    assert len(sink.committed_batches()) > len(committed_after_1)

    rows = {
        (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds():
        (r["n"], r["s"])
        for r in sink.read_committed(spark).collect()
        if (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds() < 900
    }
    assert rows == {0.0: (2.0, 3.0), 30.0: (1.0, 3.0), 60.0: (1.0, 5.0)}


def test_manifest_sink_streaming_crash_replay(spark, tmp_path):
    """Full streaming crash-mid-batch drive: die between the data write
    and the manifest PUT inside foreachBatch, restart from the same
    checkpoint, assert exactly-once output."""
    from jepl_spark.streaming.sink import ManifestCommitSink, add_lineage

    sql = "select count(value) AS n from s where value > 0"
    src = str(tmp_path / "src")
    batches = [
        [_doc("u1", "k", 1.0, 1), _doc("u1", "k", 2.0, 2)],
        *_sentinels(1000),
    ]
    write_batches(src, batches, PA_SCHEMA)
    sink = ManifestCommitSink(str(tmp_path / "msink"))

    crash_on = {1}

    def crashing_write(bdf, bid):
        if bid in crash_on and not sink.is_committed(bid):
            path = os.path.join(sink.root, "data", f"batch={int(bid)}",
                                "attempt=crashed0")
            add_lineage(bdf, bid).write.mode("error").parquet(path)
            crash_on.discard(bid)
            raise RuntimeError("injected crash before manifest put")
        sink.write_batch(bdf, bid)

    q = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        foreach_batch=crashing_write, checkpoint=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="injected crash"):
        run_to_completion(q)
    assert 1 not in sink.committed_batches()

    q2 = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        foreach_batch=crashing_write, checkpoint=str(tmp_path / "ckpt"),
    )
    run_to_completion(q2)

    rows = {
        (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds(): r["n"]
        for r in sink.read_committed(spark).collect()
        if (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds() < 900
    }
    assert rows == {0.0: 2.0}
    # the crashed attempt's files are orphans, reported for vacuum
    assert any("attempt=crashed0" in p for p in sink.orphan_files(spark))


def test_manifest_sink_compact_and_vacuum(spark, tmp_path):
    """Compaction publishes one rewritten file set behind the same
    batch-id map (replay idempotency intact, rows identical), old files
    become orphans, vacuum physically removes exactly them."""
    from jepl_spark.streaming.sink import ManifestCommitSink

    sink = ManifestCommitSink(str(tmp_path / "msink"), lineage=False)
    for b in range(3):
        sink.write_batch(spark.range(b * 10, b * 10 + 5).select(F.col("id")), b)
    before = sorted(r["id"] for r in sink.read_committed(spark).collect())
    old_files = {
        f for fl in sink.current_manifest(spark)["batches"].values() for f in fl
    }

    assert sink.compact(spark) is True
    man = sink.current_manifest(spark)
    assert man["version"] == 4  # 3 commits + 1 compaction
    # every batch id survives (idempotency), sharing ONE compacted set
    assert sink.committed_batches() == [0, 1, 2]
    newfiles = {f for fl in man["batches"].values() for f in fl}
    assert len(newfiles) == 1 and newfiles.isdisjoint(old_files)
    assert sorted(r["id"] for r in sink.read_committed(spark).collect()) == before
    # replay of a compacted batch is still a no-op
    sink.write_batch(spark.range(99).select(F.col("id")), 1)
    assert sink.current_manifest(spark)["version"] == 4

    # vacuum(keep=2) retains the last pre-compact manifest — the
    # pre-rewrite files it references are PROTECTED, so a stale reader
    # that resolved that manifest still sees a consistent snapshot
    deleted = set(sink.vacuum(spark, keep_manifests=2))
    assert not {p for p in deleted if p.endswith(".parquet")} & old_files
    assert len(sink._manifest_names(spark)) == 2  # pruned to keep_manifests
    fs_probe = spark.read.parquet(*sorted(old_files))  # still readable
    assert fs_probe.count() == len(before)
    # once the superseded manifest ages out, its files become orphans
    deleted2 = set(sink.vacuum(spark, keep_manifests=1))
    assert {p for p in deleted2 if p.endswith(".parquet")} == old_files
    assert sink.orphan_files(spark) == []
    assert sorted(r["id"] for r in sink.read_committed(spark).collect()) == before
    assert sink.committed_batches() == [0, 1, 2]  # winner survived pruning

    # below min_batches → no-op
    assert sink.compact(spark, min_batches=99) is False


def test_manifest_sink_compact_prune_history_watermark(spark, tmp_path):
    """prune_history=True collapses the per-batch map into the
    compacted_through watermark: manifest stays bounded, replay of any
    pre-watermark batch id is still a no-op, new batches append after
    the watermark, and rows survive a second (folding) compaction."""
    from jepl_spark.streaming.sink import ManifestCommitSink

    sink = ManifestCommitSink(str(tmp_path / "msink"), lineage=False)
    for b in range(3):
        sink.write_batch(spark.range(b * 10, b * 10 + 4).select(F.col("id")), b)
    before = sorted(r["id"] for r in sink.read_committed(spark).collect())

    assert sink.compact(spark, prune_history=True) is True
    man = sink.current_manifest(spark)
    assert man["batches"] == {} and man["compacted_through"] == 2
    assert sink.is_committed(0) and sink.is_committed(2)
    assert not sink.is_committed(3)
    assert sink.committed_batches() == []  # summarized by the watermark
    assert sorted(r["id"] for r in sink.read_committed(spark).collect()) == before

    # replay of a pre-watermark batch is a no-op
    v = man["version"]
    sink.write_batch(spark.range(99).select(F.col("id")), 1)
    assert sink.current_manifest(spark)["version"] == v

    # new batches append normally after the watermark
    sink.write_batch(spark.range(100, 103).select(F.col("id")), 3)
    got = sorted(r["id"] for r in sink.read_committed(spark).collect())
    assert got == before + [100, 101, 102]
    assert sink.committed_batches() == [3]

    # a second pruning compaction folds the old compacted files + batch 3
    assert sink.compact(spark, prune_history=True) is True
    man2 = sink.current_manifest(spark)
    assert man2["compacted_through"] == 3 and man2["batches"] == {}
    assert sorted(
        r["id"] for r in sink.read_committed(spark).collect()
    ) == before + [100, 101, 102]


def test_continuous_processing_time_trigger(spark, tmp_path):
    """The sustained-streaming path (processingTime trigger, files
    arriving WHILE the query runs): rows flow across multiple triggers
    into the exactly-once sink, and a graceful stop leaves only
    committed batches behind."""
    import threading
    import time as _t

    sql = "select count(value) AS n, sum(value) AS s from s where value > 0"
    src = str(tmp_path / "src")
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    write_batches(src, [[_doc("u1", "k", 1.0, 1), _doc("u2", "k", 2.0, 2)]],
                  PA_SCHEMA)

    q = run_rule_stream(
        sql, file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
        ts_col="event_time", duration="30 seconds", watermark="10 seconds",
        sink=sink, checkpoint=str(tmp_path / "ckpt"),
        available_now=False,
    )
    # availableNow=False leaves the default micro-batch trigger running
    # continuously; feed more files while it runs
    def feed():
        for i, docs in enumerate(
            [[_doc("u1", "k", 3.0, 31)], *_sentinels(1000)]
        ):
            _t.sleep(1.0)
            write_batches(str(tmp_path / f"feed{i}"), [docs], PA_SCHEMA)
            os.replace(
                os.path.join(str(tmp_path / f"feed{i}"), "00000.parquet"),
                os.path.join(src, f"9{i:04d}.parquet"),
            )

    t = threading.Thread(target=feed)
    t.start()
    deadline = _t.time() + 60
    want = {0.0: (2.0, 3.0), 30.0: (1.0, 3.0)}
    got = {}
    while _t.time() < deadline:
        _t.sleep(2.0)
        try:
            got = {
                (r["window_start"].replace(tzinfo=timezone.utc) - BASE).total_seconds():
                (r["n"], r["s"])
                for r in sink.read_committed(spark).collect()
                if (r["window_start"].replace(tzinfo=timezone.utc) - BASE)
                .total_seconds() < 900
            }
        except ValueError:
            continue  # nothing committed yet
        if got == want:
            break
    t.join()
    q.stop()
    assert got == want, got


def test_manifest_sink_prune_gap_rejected_and_idle_fold(spark, tmp_path):
    """Review r3 follow-ups: (a) prune_history REFUSES gap'd batch ids
    (the watermark would silently no-op a future commit of the missing
    id); (b) an idle stream's all-empty batches fold metadata-only so
    the manifest stays bounded; (c) committed_count survives pruning."""
    from jepl_spark.streaming.sink import ManifestCommitSink

    # (a) gap: ids 0,1 then 5
    sink = ManifestCommitSink(str(tmp_path / "gap"), lineage=False)
    for b in (0, 1, 5):
        sink.write_batch(spark.range(3).select(F.col("id")), b)
    with pytest.raises(ValueError, match="gap-free"):
        sink.compact(spark, prune_history=True)
    # non-pruning compaction is still fine on gap'd ids
    assert sink.compact(spark, prune_history=False) is True

    # (b) idle: three 0-row batches (Spark still writes one empty part
    # file per batch) — pruning folds them into the watermark and ONE
    # tiny compacted file set, so the manifest stays bounded; the
    # metadata-only branch covers stores where empty writes produce no
    # files at all
    idle = ManifestCommitSink(str(tmp_path / "idle"), lineage=False)
    empty = spark.range(1).select(F.col("id")).filter(F.col("id") < 0)
    for b in range(3):
        idle.write_batch(empty, b)
    assert idle.committed_count() == 3
    assert idle.compact(spark, prune_history=True) is True
    man = idle.current_manifest(spark)
    assert man["batches"] == {} and man["compacted_through"] == 2
    assert len(man["compacted_files"]) <= 1
    assert idle.committed_count() == 3      # n_compacted carries the total
    assert idle.is_committed(1) and not idle.is_committed(3)
    assert idle.read_committed(spark).count() == 0

    # (c) counts across a data-bearing prune
    full = ManifestCommitSink(str(tmp_path / "full"), lineage=False)
    for b in range(4):
        full.write_batch(spark.range(2).select(F.col("id")), b)
    assert full.committed_count() == 4
    full.compact(spark, prune_history=True)
    assert full.committed_count() == 4
    full.write_batch(spark.range(2).select(F.col("id")), 4)
    assert full.committed_count() == 5


def test_outer_join_requires_watermarks(spark, tmp_path):
    """Review finding: the outer join must reject a None watermark on a
    side with no upstream watermark (Spark would otherwise fail at
    query start with an opaque AnalysisException) — and accept None
    when the side IS watermarked upstream."""
    from jepl_spark.sources.clips import clips_df, transcripts_df
    from jepl_spark.streaming.join import audio_transcript_join_outer

    a_src, t_src = str(tmp_path / "a"), str(tmp_path / "t")
    audio_b = clips_df(spark, 4).select("clip_id", "event_time")
    trans_b = transcripts_df(spark, 4)
    audio_b.write.parquet(a_src)
    trans_b.write.parquet(t_src)
    a = file_stream(spark, a_src, audio_b.schema)
    t = file_stream(spark, t_src, trans_b.schema)
    with pytest.raises(ValueError, match="OUTER join requires watermarks"):
        audio_transcript_join_outer(a, t, audio_watermark=None)
    with pytest.raises(ValueError, match="OUTER join requires watermarks"):
        audio_transcript_join_outer(a, t, transcript_watermark=None)
    # upstream-watermarked side: None is the CORRECT configuration
    pre = a.withWatermark("event_time", "10 seconds")
    joined = audio_transcript_join_outer(pre, t, audio_watermark=None)
    assert joined.isStreaming


def test_stream_windowed_topk_restart_idempotent(spark, tmp_path):
    """Restart from the same checkpoint with no new input commits
    nothing new; a manual replay of a committed batch id is a no-op."""
    from jepl_spark.operators.stats import stream_windowed_topk

    batches = [
        [{"user": "a", "kind": "x", "value": 1.0, "event_time": ts(1)},
         {"user": "b", "kind": "x", "value": 1.0, "event_time": ts(2)}],
        [{"user": "z", "kind": "x", "value": 1.0, "event_time": ts(1000)}],
    ]
    src = str(tmp_path / "src")
    write_batches(src, batches, PA_SCHEMA)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))

    def run():
        counts, fb = stream_windowed_topk(
            file_stream(spark, src, SPARK_SCHEMA, max_files_per_trigger=1),
            "user", sink, ts_col="event_time", duration="30 seconds",
            k=2, watermark="10 seconds",
        )
        q = (
            counts.writeStream.outputMode("append")
            .foreachBatch(fb)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)

    run()
    first = sorted(tuple(r) for r in sink.read_committed(spark).collect())
    n = sink.committed_count(spark)
    assert any(r for r in first)  # the [0,30) window emitted
    run()  # resume, no new data
    assert sorted(tuple(r) for r in sink.read_committed(spark).collect()) == first
    assert sink.committed_count(spark) == n
    # manual replay of committed batch 0 with poisoned data: no-op
    _, fb2 = stream_windowed_topk(
        file_stream(spark, src, SPARK_SCHEMA), "user", sink,
        ts_col="event_time", duration="30 seconds", k=2,
        watermark="10 seconds",
    )
    poison = spark.createDataFrame(
        [(ts(3), "poison", 99)],
        "window_start timestamp, user string, cnt long",
    )
    fb2(poison, 0)
    assert sorted(tuple(r) for r in sink.read_committed(spark).collect()) == first
