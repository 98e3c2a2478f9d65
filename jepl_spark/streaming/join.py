"""Watermarked stream-stream join of the audio and transcript streams.

Mandated by the north rule (SURVEY.md §2.3): inner equi-join on
``clip_id`` with an event-time range condition so Spark can bound join
state with both watermarks and evict rows once the other side can no
longer match (Structured Streaming's stream-stream join contract).

Chaining note: the join output already carries the inputs' watermark —
do NOT call ``withWatermark`` again before a downstream windowed
aggregation (Spark ≥3.4 chains stateful operators but rejects watermark
redefinition: "Redefining watermark is disallowed").

Skew: a Zipf-hot ``clip_id`` concentrates one join key on one task.
``salt`` replicates the transcript side S× and splits the audio side by
a deterministic hash — state grows S× on the replicated side, hot-key
work spreads across S tasks.  Use for measured hot keys; AQE skew-join
does not apply to streaming state, so this is the explicit handle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import ensure_event_timestamp


def audio_transcript_join(
    audio: DataFrame,
    transcripts: DataFrame,
    *,
    audio_watermark: Optional[str] = "30 seconds",
    transcript_watermark: Optional[str] = "30 seconds",
    max_delay: str = "60 seconds",
    ts_col: str = "event_time",
    salt: Optional[int] = None,
) -> DataFrame:
    """audio(clip_id, bytes, …, event_time) ⋈ transcripts(clip_id,
    transcript, event_time): transcript must arrive within
    [audio.event_time, audio.event_time + max_delay].

    Pass ``None`` for a side's watermark when that input is ALREADY
    watermarked upstream (e.g. stream_exact_dedup applied before the
    join) — Spark rejects watermark redefinition, and stream-stream
    join state eviction still requires both sides to carry one."""
    audio = ensure_event_timestamp(audio, ts_col)
    transcripts = ensure_event_timestamp(transcripts, ts_col)
    a = (
        audio.withWatermark(ts_col, audio_watermark)
        if audio_watermark is not None else audio
    ).alias("a")
    t = (
        transcripts.withWatermark(ts_col, transcript_watermark)
        if transcript_watermark is not None else transcripts
    ).alias("t")

    if salt is not None and salt > 1:
        a = a.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(f"a.{ts_col}")), F.lit(salt))
        )
        t = t.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        ).withColumn("__salt", F.col("__salt").cast("long"))
        key = (F.col("a.clip_id") == F.col("t.clip_id")) & (
            a["__salt"] == t["__salt"]
        )
    else:
        key = F.col("a.clip_id") == F.col("t.clip_id")

    cond = (
        key
        & (F.col(f"t.{ts_col}") >= F.col(f"a.{ts_col}"))
        & (F.col(f"t.{ts_col}") <= F.col(f"a.{ts_col}") + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = a.join(t, cond, "inner")
    cols = [F.col(f"a.{c}") for c in audio.columns] + [
        F.col("t.transcript").alias("joined_transcript"),
        F.col(f"t.{ts_col}").alias("transcript_time"),
    ]
    return joined.select(*cols)


def audio_transcript_join_outer(
    audio: DataFrame,
    transcripts: DataFrame,
    *,
    audio_watermark: Optional[str] = "30 seconds",
    transcript_watermark: Optional[str] = "30 seconds",
    max_delay: str = "60 seconds",
    ts_col: str = "event_time",
) -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join: every audio clip
    emits — matched clips as soon as their transcript arrives, and a
    NULL-transcript row once BOTH watermarks prove no transcript can
    still match (audio join state past its event-time bound).  This is
    the data-completeness lane: the NULL rows ARE the
    missing-transcript report a 10¹²-clip ingest needs, produced by
    the same join state that serves the happy path — no second scan,
    no anti-join over history.

    Emission timing of the NULL rows is watermark-driven (they appear
    a micro-batch or two after the match window closes — Spark's
    outer-join contract), so downstream consumers must not assume
    arrival order between matched and unmatched rows.  Salting is
    deliberately NOT offered here: replicating the transcript side
    would emit ``salt`` NULL rows per unmatched clip (one per salt
    partition that saw no match) — dedup them downstream or keep outer
    joins unsalted and let AQE-less streaming state partitioning carry
    the skew.

    Unlike the inner join, ``None`` watermarks are NOT a supported
    configuration here: Spark requires watermarks on BOTH sides of a
    stream-stream outer join (NULL rows can only emit once a watermark
    proves no match is coming), so pass ``None`` ONLY for a side that
    is already watermarked upstream."""
    audio = ensure_event_timestamp(audio, ts_col)
    transcripts = ensure_event_timestamp(transcripts, ts_col)
    for side, wm, df_side in (
        ("audio", audio_watermark, audio),
        ("transcript", transcript_watermark, transcripts),
    ):
        # column-specific check: the EventTimeWatermark node must tag
        # THIS ts_col — a watermark on a different column would still
        # fail at query start, so mere presence of any watermark node
        # must not pass.  Spark 4.1 renders the node as
        # "EventTimeWatermark <uuid>, <col>#<id>: ..."; older versions
        # omit the uuid — the regex accepts both.
        import re as _re

        if wm is None and not _re.search(
            rf"EventTimeWatermark (?:[^,\n]*, )?{_re.escape(ts_col)}#",
            df_side._jdf.queryExecution().analyzed().toString(),
        ):
            raise ValueError(
                f"{side}_watermark=None but the {side} side carries no "
                f"upstream watermark on {ts_col!r} (no 'EventTimeWatermark "
                f"{ts_col}' in its plan): a stream-stream OUTER join "
                f"requires watermarks on both sides — NULL rows emit only "
                f"when a watermark closes the match window.  Pass a "
                f"watermark here, or watermark that input upstream."
            )
    a = (
        audio.withWatermark(ts_col, audio_watermark)
        if audio_watermark is not None else audio
    ).alias("a")
    t = (
        transcripts.withWatermark(ts_col, transcript_watermark)
        if transcript_watermark is not None else transcripts
    ).alias("t")
    cond = (
        (F.col("a.clip_id") == F.col("t.clip_id"))
        & (F.col(f"t.{ts_col}") >= F.col(f"a.{ts_col}"))
        & (F.col(f"t.{ts_col}") <= F.col(f"a.{ts_col}")
           + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = a.join(t, cond, "left_outer")
    cols = [F.col(f"a.{c}") for c in audio.columns] + [
        F.col("t.transcript").alias("joined_transcript"),
        F.col(f"t.{ts_col}").alias("transcript_time"),
    ]
    return joined.select(*cols)
