"""The north-rule streaming job, packaged for spark-submit.

    spark-submit --master <cluster> \\
        --py-files jepl_spark.zip \\
        jobs/clips_pipeline.py \\
        --audio-path <dir> --transcript-path <dir> \\
        --sink <dir> --checkpoint <dir> \\
        [--rule "select count(clip_id) AS n from clips where ..."] \\
        [--window "1 minute"] [--watermark "30 seconds"] [--salt 8] \\
        [--sink-protocol marker|manifest]  # manifest = rename-free (object stores)
        [--dedup-watermark "1 hour"]       # streaming exact dedup on transcript text
        [--synthesize N]          # generate deterministic inputs first

Pipeline: audio stream → Arrow decode/feature UDF (bytes cross the
JVM boundary once, features only afterwards) → watermarked stream-stream
join with the transcript stream on clip_id → windowed per-codec JEPL
aggregation → exactly-once sink with per-partition lineage.  Metrics are
printed as one JSON line at exit (MetricsListener summary).

On a real cluster the file source swaps for an Iceberg table scan
with no plan changes; for the sink, --sink-protocol manifest selects
ManifestCommitSink, whose exactly-once commit needs only atomic PUT +
LIST (s3a/gs/abfs-safe, no rename atomicity assumed).  Checkpoint +
idempotent commits give exactly-once across restarts at either size.
Run at N and 4N executors with identical input to measure scaling.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--audio-path", required=True)
    p.add_argument("--transcript-path", required=True)
    p.add_argument("--sink", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--rule", default=None, help="JEPL rule applied to the joined stream")
    p.add_argument("--window", default="1 minute")
    p.add_argument("--watermark", default="30 seconds")
    p.add_argument("--max-delay", default="60 seconds")
    p.add_argument("--salt", type=int, default=None)
    p.add_argument("--sink-protocol", choices=("marker", "manifest"),
                   default="marker",
                   help="marker = atomic-rename commit markers (local/HDFS); "
                        "manifest = rename-free manifest commits (object stores)")
    p.add_argument("--dedup-watermark", default=None,
                   help="if set, apply streaming exact dedup (content_hash of "
                        "the transcript) with this event-time horizon before "
                        "the join")
    p.add_argument("--missing-report", default=None,
                   help="also run a LEFT-OUTER join query writing clips "
                        "whose transcript never arrived (NULL once both "
                        "watermarks close the match window) to this dir — "
                        "the data-completeness report; checkpoint at "
                        "<checkpoint>_missing.  Clips whose match window "
                        "has not yet closed at end of input are not "
                        "reported yet (watermark semantics) — they emit "
                        "on the next run once later events advance the "
                        "watermark")
    p.add_argument("--synthesize", type=int, default=0)
    p.add_argument("--continuous", action="store_true",
                   help="keep running (processingTime trigger) instead of availableNow")
    p.add_argument("--chunk-ms", type=int, default=None,
                   help="chunk-export mode: instead of the windowed rule, "
                        "segment clips into fixed windows, stream-join each "
                        "chunk with its transcript, and sink (chunk, "
                        "transcript) training rows")
    p.add_argument("--chunk-hop-ms", type=int, default=None)
    p.add_argument("--chunk-min-tail-ms", type=int, default=0)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("jepl-clips-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from jepl_spark.functions.audio_udfs import with_audio_features
    from jepl_spark.sources.clips import clips_df, transcripts_df
    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.join import audio_transcript_join
    from jepl_spark.streaming.listener import MetricsListener
    from jepl_spark.streaming.sink import (
        IdempotentParquetSink,
        ManifestCommitSink,
    )
    from jepl_spark.streaming.windows import windowed_select

    if args.synthesize:
        clips_df(spark, args.synthesize, step_s=0.05).write.mode("overwrite").parquet(
            args.audio_path
        )
        transcripts_df(spark, args.synthesize, step_s=0.05, delay_s=1.0).write.mode(
            "overwrite"
        ).parquet(args.transcript_path)

    listener = MetricsListener()
    spark.streams.addListener(listener)

    schema_a = clips_df(spark, 1).schema
    schema_t = transcripts_df(spark, 1).schema

    t0 = time.time()
    a = file_stream(spark, args.audio_path, schema_a)
    t_raw = file_stream(spark, args.transcript_path, schema_t).drop("seq")
    t = t_raw
    if args.dedup_watermark:
        from jepl_spark.operators.dedup import stream_exact_dedup

        t = stream_exact_dedup(
            t, text_col="transcript", ts_col="event_time",
            watermark=args.dedup_watermark,
        ).drop("content_hash")
    if args.chunk_ms:
        # training-shard export: chunk rows (bytes are pcm16 slices)
        # stream-joined with their transcript, no aggregation
        from jepl_spark.functions.audio_udfs import chunk_clips

        chunks = chunk_clips(
            a.drop("transcript"),
            chunk_ms=args.chunk_ms,
            hop_ms=args.chunk_hop_ms,
            min_tail_ms=args.chunk_min_tail_ms,
        ).drop("transcript")
        result = audio_transcript_join(
            chunks, t,
            audio_watermark=args.watermark,
            transcript_watermark=None if args.dedup_watermark else args.watermark,
            max_delay=args.max_delay,
            salt=args.salt,
        )
    else:
        slim = with_audio_features(a).select(
            "clip_id", "codec", "sr_hz", "dur_ms", "event_time",
            F.col("af.rms").alias("rms"),
            F.col("af.n_samples").alias("n_samples"),
            F.col("af.feat").alias("feat"),
        )
        joined = audio_transcript_join(
            slim, t,
            audio_watermark=args.watermark,
            # the dedup operator already watermarked the transcript side —
            # Spark rejects redefinition, so the join must not re-apply one
            transcript_watermark=None if args.dedup_watermark else args.watermark,
            max_delay=args.max_delay,
            salt=args.salt,
        )

        rule = args.rule or (
            "select count(clip_id) AS n_clips, avg(rms) AS avg_rms, "
            "max(dur_ms) AS max_dur, sum(n_samples) AS samples "
            "from joined where rms > 0 group by codec"
        )
        result = windowed_select(
            rule, joined, ts_col="event_time", duration=args.window, watermark=None
        )

    if args.missing_report:
        if args.chunk_ms:
            p.error("--missing-report is not supported with --chunk-ms")
        if args.continuous:
            p.error("--missing-report requires availableNow mode (drop "
                    "--continuous)")

    sink_cls = (
        ManifestCommitSink if args.sink_protocol == "manifest"
        else IdempotentParquetSink
    )
    sink = sink_cls(args.sink)
    writer = (
        result.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", args.checkpoint)
    )
    if args.continuous:
        q = writer.trigger(processingTime="10 seconds").start()
        q.awaitTermination()
    else:
        q = writer.trigger(availableNow=True).start()
        run_to_completion(q, timeout_s=3600)

    # snapshot the main pipeline's metrics BEFORE the (optional)
    # missing-report query runs: it re-reads both sources under the
    # same session-global listener and would otherwise double-count
    # input_rows / inflate clips_per_sec
    wall = time.time() - t0
    summary = listener.summary()
    summary.update(
        wall_s=round(wall, 2),
        committed_batches=sink.committed_count(),
        clips_per_sec=round(summary["input_rows"] / wall, 1) if wall else None,
    )

    if args.missing_report:
        from jepl_spark.streaming.join import audio_transcript_join_outer

        # a second query over the SAME source frames (independent
        # progress via its own checkpoint), run after the main one so
        # the summary above describes only the main pipeline.  The
        # unmatched discriminator is transcript_time IS NULL — non-null
        # on every matched row — NOT joined_transcript IS NULL, which
        # a matched transcript row with NULL text would also satisfy.
        miss = audio_transcript_join_outer(
            a.select("clip_id", "codec", "event_time"),
            t_raw,
            audio_watermark=args.watermark,
            transcript_watermark=args.watermark,
            max_delay=args.max_delay,
        ).where(F.col("transcript_time").isNull()).select(
            "clip_id", "codec", "event_time"
        )
        missing_sink = IdempotentParquetSink(args.missing_report)
        q_missing = (
            miss.writeStream.outputMode("append")
            .foreachBatch(missing_sink.foreach_batch())
            .option("checkpointLocation", args.checkpoint + "_missing")
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q_missing, timeout_s=3600)
        try:
            summary["missing_transcripts"] = (
                missing_sink.read_committed(spark).count()
            )
        except ValueError:
            summary["missing_transcripts"] = 0
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
