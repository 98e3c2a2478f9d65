"""Audio corpus ADMISSION job, packaged for spark-submit: the ingest
stage that runs BEFORE the training pipeline — every arriving clip is
fingerprinted and near-dup-checked against the batch and the admitted
corpus; only novel audio commits to the curated store the downstream
jobs (clips_pipeline, serving) read.

    spark-submit --py-files jepl_spark.zip jobs/audio_ingest.py \\
        --audio-path <dir> --sink <dir> --checkpoint <dir> \\
        [--max-hamming 10] [--dur-tol-ms 25] \\
        [--near-dup-match exact|offset] [--max-trim-ms 2000] \\
        [--exact-dedup-watermark "1 hour"]  # drop byte-identical first
        [--max-clipping-ratio 0.05] [--max-silence-ratio 0.9] \\
        [--min-tps 1.0 --max-tps 8.0]  # transcript-rate pair admission
        [--sink-protocol marker|manifest] \\
        [--synthesize N] [--plant-dups | --plant-degraded]

Two admission filters, cheap first:

1. (optional) streaming EXACT dedup on the raw bytes — byte-identical
   re-deliveries die in watermark-bounded state before any decode.
2. audio NEAR-dedup (operators/audio_dedup.py): 240-bit
   Haitsma-Kalker fingerprint (Arrow UDF, audio decoded exactly once),
   (sr_hz, duration-bucket) blocking join, JVM Hamming verify, against
   both the micro-batch and the committed corpus.

The committed rows carry the fingerprint column, so later batches'
vs-admitted checks are a column-pruned parquet read — admitted audio
is never re-decoded.  Exactly-once via the sink's batch-id ledger;
a restart resumes from the durably admitted corpus (no separate state).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--audio-path", required=True)
    p.add_argument("--sink", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--max-hamming", type=int, default=10)
    p.add_argument("--dur-tol-ms", type=int, default=None,
                   help="exact match only: duration blocking tolerance "
                        "in ms (default 25)")
    p.add_argument("--exact-dedup-watermark", default=None,
                   help="also drop byte-identical clips in "
                        "watermark-bounded state before the near-dup "
                        "stage")
    p.add_argument("--near-dup-match", choices=("exact", "offset"),
                   default="exact",
                   help="'exact' = same-duration regain/transcode "
                        "copies (the default blocked-fingerprint "
                        "lane); 'offset' = additionally catch clips "
                        "with up to --max-trim-ms of lead/tail trim "
                        "via head/tail-anchored window fingerprints "
                        "(its own _signatures_offset side table)")
    p.add_argument("--max-trim-ms", type=int, default=None,
                   help="offset match only: maximum lead/tail trim to "
                        "tolerate, also the duration blocking width "
                        "(default 2000)")
    p.add_argument("--canonical-sr", type=int, default=None,
                   help="fingerprint at this canonical sample rate and "
                        "block on duration alone, so cross-rate "
                        "transcode re-uploads (8k vs 16k) dedup too; "
                        "pick once per corpus — signatures at "
                        "different canonical rates don't compare")
    p.add_argument("--near-dup-horizon-s", type=int, default=None,
                   help="bound the vs-admitted near-dup check to "
                        "signatures within this many seconds before "
                        "the batch's earliest event_time (recall "
                        "consequence: older copies re-admit); default "
                        "= no time bound — the partitioned signature "
                        "side table already bounds the read")
    p.add_argument("--sink-protocol", choices=("marker", "manifest"),
                   default="marker")
    p.add_argument("--max-clipping-ratio", type=float, default=None,
                   help="quality admission: reject clips with more "
                        "than this fraction of samples at the codec "
                        "rail (decodes in its own Arrow pass, before "
                        "fingerprinting — rejected clips never enter "
                        "the near-dup store)")
    p.add_argument("--max-silence-ratio", type=float, default=None,
                   help="quality admission: reject clips with more "
                        "than this fraction of samples under -40 dBFS")
    p.add_argument("--min-tps", type=float, default=None,
                   help="pair admission: reject clips whose transcript "
                        "rate (tokens per voiced second, VAD framing) "
                        "is below this — the misaligned-transcript "
                        "filter; requires --max-tps")
    p.add_argument("--max-tps", type=float, default=None,
                   help="pair admission: reject clips whose transcript "
                        "rate is above this; requires --min-tps")
    p.add_argument("--synthesize", type=int, default=0)
    p.add_argument("--plant-dups", action="store_true",
                   help="with --synthesize: plant a near-dup copy at "
                        "every 7th clip (test/demo corpus)")
    p.add_argument("--plant-degraded", action="store_true",
                   help="with --synthesize: plant clipped/silent "
                        "defects (quality-admission test corpus)")
    args = p.parse_args(argv)
    if (args.min_tps is None) != (args.max_tps is None):
        p.error("--min-tps and --max-tps must be given together")
    # each near-dup lane has its own tolerance knob — reject the other
    # lane's knob instead of silently ignoring it
    if args.near_dup_match == "offset" and args.dur_tol_ms is not None:
        p.error("--dur-tol-ms applies to --near-dup-match exact; "
                "the offset lane's tolerance is --max-trim-ms")
    if args.near_dup_match == "exact" and args.max_trim_ms is not None:
        p.error("--max-trim-ms applies to --near-dup-match offset; "
                "the exact lane's tolerance is --dur-tol-ms")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("jepl-audio-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from jepl_spark.operators.audio_dedup import (
        stream_audio_near_dedup,
        stream_audio_trim_near_dedup,
    )
    from jepl_spark.sources.clips import clips_df, planted_dup_clips
    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.listener import MetricsListener
    from jepl_spark.streaming.sink import (
        IdempotentParquetSink,
        ManifestCommitSink,
    )

    if args.synthesize:
        if args.plant_dups and args.plant_degraded:
            p.error("--plant-dups and --plant-degraded are exclusive")
        from jepl_spark.sources.clips import degraded_clips

        gen = (
            planted_dup_clips if args.plant_dups
            else degraded_clips if args.plant_degraded
            else clips_df
        )
        gen(spark, args.synthesize).write.mode("overwrite").parquet(
            args.audio_path
        )

    listener = MetricsListener()
    spark.streams.addListener(listener)

    schema = clips_df(spark, 1).schema
    stream = file_stream(spark, args.audio_path, schema)
    if args.exact_dedup_watermark:
        # raw md5 of the bytes, NOT dedup.content_hash: that helper
        # whitespace-normalizes text and would mangle binary payloads
        from pyspark.sql import functions as F

        stream = (
            stream.withColumn("__bh", F.md5(F.col("bytes")))
            .withWatermark("event_time", args.exact_dedup_watermark)
            .dropDuplicatesWithinWatermark(["__bh"])
            .drop("__bh")
        )

    if (args.max_clipping_ratio is not None
            or args.max_silence_ratio is not None):
        from pyspark.sql import functions as F

        from jepl_spark.functions.audio_udfs import admit_clips

        # only the checks the operator asked for: an absent flag
        # DISABLES that check (inf threshold) rather than silently
        # applying the library default (empty clips always reject —
        # a zero-sample clip is never admissible audio)
        kw = {
            "max_clipping_ratio": (
                args.max_clipping_ratio
                if args.max_clipping_ratio is not None else float("inf")
            ),
            "max_silence_ratio": (
                args.max_silence_ratio
                if args.max_silence_ratio is not None else float("inf")
            ),
        }
        stream = (
            admit_clips(stream, **kw)
            .where(F.col("reject_reason").isNull())
            .drop("aq", "reject_reason")
        )

    if args.min_tps is not None:
        # transcript↔audio consistency: stateless Arrow voiced_ms +
        # JVM rate CASE, so it composes with the streaming plan like
        # the quality stage above (decode pass #2 of at most 3 —
        # rejected pairs never reach the fingerprint stage)
        from pyspark.sql import functions as F

        from jepl_spark.functions.audio_udfs import admit_paired_clips

        stream = (
            admit_paired_clips(stream, min_tps=args.min_tps,
                               max_tps=args.max_tps)
            .where(F.col("reject_reason").isNull())
            .drop("voiced_ms", "n_tokens", "tokens_per_voiced_s",
                  "reject_reason")
        )

    sink_cls = (
        ManifestCommitSink if args.sink_protocol == "manifest"
        else IdempotentParquetSink
    )
    sink = sink_cls(args.sink)
    t0 = time.time()
    horizon_kw = (
        {"ts_col": "event_time", "horizon_s": args.near_dup_horizon_s}
        if args.near_dup_horizon_s is not None else {}
    )
    if args.near_dup_match == "offset":
        prepared, fb = stream_audio_trim_near_dedup(
            stream, sink,
            max_hamming=args.max_hamming,
            max_trim_ms=(args.max_trim_ms
                         if args.max_trim_ms is not None else 2000),
            **({"canonical_sr": args.canonical_sr}
               if args.canonical_sr is not None else {}),
            **horizon_kw,
        )
    else:
        prepared, fb = stream_audio_near_dedup(
            stream, sink,
            max_hamming=args.max_hamming,
            dur_tol_ms=(args.dur_tol_ms
                        if args.dur_tol_ms is not None else 25),
            canonical_sr=args.canonical_sr,
            **horizon_kw,
        )
    q = (
        prepared.writeStream.outputMode("append")
        .foreachBatch(fb)
        .option("checkpointLocation", args.checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q, timeout_s=3600)

    wall = time.time() - t0
    summary = listener.summary()
    admitted = sink.read_committed(spark).count()
    summary.update(
        wall_s=round(wall, 2),
        committed_batches=sink.committed_count(),
        admitted_clips=admitted,
        dropped_clips=(summary["input_rows"] - admitted
                       if summary.get("input_rows") is not None else None),
        clips_per_sec=(round(summary["input_rows"] / wall, 1)
                       if wall and summary.get("input_rows") else None),
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
