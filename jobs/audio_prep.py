"""Audio training-data PREP pipeline, packaged for spark-submit: the
batch stage between the admitted corpus (jobs/audio_ingest.py writes
it) and the trainer — the audio analogue of jobs/corpus_pipeline.py.

    spark-submit --master <cluster> --py-files jepl_spark.zip \\
        jobs/audio_prep.py \\
        --input <clips.parquet> --output <dir> \\
        [--resample 16000]                 # canonical-rate FIRST
        [--trim-silence] [--normalize-dbfs -20.0] \\
        [--min-tps 1.0 --max-tps 8.0]      # transcript-rate admission
        [--chunk-ms 250 --hop-ms 200 --min-tail-ms 100]  # + alignment
        [--time-mask N --max-mask-ms 100 --mask-seed epoch0]
        [--speed-perturb]                  # 0.9/1.0/1.1 sp explode
        [--batch-size 16 --bucket-ms 500]  # duration-bucketed batches
        [--shard-bytes N]                  # sized-shard export manifest
        [--logmel 40 [--logmel-fmax HZ] [--logmel-cmvn]
         [--logmel-deltas]]                # per-frame fbank features
        [--pack-ms N]                      # whole-clip example packs
        [--report-only]

Stage order is the one that minimizes bytes through the pipe:

  0. resample    — canonical rate FIRST (--resample): one decode +
                   interpolation per non-canonical clip; rows already
                   at the target pass bit-identical, downstream
                   fingerprints compare across original rates, and
                   --logmel needs no pinned fmax
  1. trim        — silence cut: every later decode pays only for
                   speech (byte surgery, survivors bit-identical)
  2. normalize   — RMS gain to target dBFS (peak-capped)
  3. pair gate   — transcript↔voiced-duration rate admission: broken
                   pairs leave before chunking multiplies them
  4. chunk+align — fixed windows + proportional transcript spans; the
                   written unit becomes a training example
  5. augment     — speed perturbation first, THEN deterministic time
                   masks, so every mask span is recorded in the final
                   (possibly stretched) timeline and each perturbed
                   copy's re-keyed id draws its own masks
                   (seed-parameterized: per-epoch masks without
                   materializing copies is the trainer's call — this
                   job materializes when asked)
  6. features    — per-frame fbank extraction (--logmel) AFTER every
                   audio-domain stage, so the features reflect the
                   exact audio a trainer consumes
  7. batch plan  — duration-bucketed fixed-size batches (padding
                   report in the JSON line), a sized-shard export
                   manifest, and/or whole-clip packs (--pack-ms)
                   written next to the output

Every stage is a stateless Arrow pass or an ids+longs shuffle, with
ONE exception: --pack-ms materializes byte-concatenated training
examples, which is inherently an audio-byte exchange (bytes must
co-locate to build the pack) — every other stage keeps audio bytes
out of shuffles (chunking emits them map-side, batching/sharding
plan over metadata only).  One JSON report line at exit carries
per-stage row counts and the padding summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--id-col", default="clip_id")
    p.add_argument("--resample", type=int, default=None,
                   help="resample every clip to this canonical rate "
                        "(first stage; same-rate rows pass "
                        "bit-identical)")
    p.add_argument("--trim-silence", action="store_true")
    p.add_argument("--trim-frame-ms", type=int, default=20)
    p.add_argument("--normalize-dbfs", type=float, default=None)
    p.add_argument("--min-tps", type=float, default=None)
    p.add_argument("--max-tps", type=float, default=None)
    p.add_argument("--chunk-ms", type=int, default=None)
    p.add_argument("--hop-ms", type=int, default=None)
    p.add_argument("--min-tail-ms", type=int, default=0)
    p.add_argument("--time-mask", type=int, default=None,
                   help="number of SpecAugment time masks per clip")
    p.add_argument("--max-mask-ms", type=int, default=100)
    p.add_argument("--mask-seed", default="mask")
    p.add_argument("--speed-perturb", action="store_true",
                   help="0.9/1.0/1.1 speed explode (3x rows)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--bucket-ms", type=int, default=500)
    p.add_argument("--shard-bytes", type=int, default=None)
    p.add_argument("--logmel", type=int, default=None,
                   help="write per-frame log-mel fbank features of "
                        "this many mel bins to <output>_features "
                        "(extracted AFTER all audio-domain stages, so "
                        "trims/gain/masks/perturbation are reflected)")
    p.add_argument("--logmel-fmax", type=float, default=None,
                   help="pin the mel range's upper edge in Hz — "
                        "REQUIRED for mixed-sample-rate corpora so "
                        "mel bin k means the same band on every row")
    p.add_argument("--logmel-cmvn", action="store_true",
                   help="per-utterance mean/variance normalization "
                        "inside the extraction pass (zero shuffle)")
    p.add_argument("--logmel-deltas", action="store_true",
                   help="append Δ/ΔΔ regression delta columns")
    p.add_argument("--freq-mask", type=int, default=None,
                   help="SpecAugment frequency masks per clip, applied "
                        "to the --logmel features (after CMVN, before "
                        "deltas); draws from --mask-seed")
    p.add_argument("--freq-mask-bins", type=int, default=8,
                   help="max mel bins per frequency mask")
    p.add_argument("--pack-ms", type=int, default=None,
                   help="materialize ~this-long training examples: "
                        "whole clips byte-concatenated per (sr, codec) "
                        "family with a byte-true manifest (raw codecs "
                        "only — run after chunking or on raw-codec "
                        "corpora)")
    p.add_argument("--report-only", action="store_true")
    args = p.parse_args(argv)
    if (args.min_tps is None) != (args.max_tps is None):
        p.error("--min-tps and --max-tps must be given together")
    if args.output is None and not args.report_only:
        p.error("--output is required unless --report-only")
    if args.logmel is None and (
        args.logmel_fmax is not None or args.logmel_cmvn
        or args.logmel_deltas or args.freq_mask is not None
    ):
        p.error("--logmel-fmax/--logmel-cmvn/--logmel-deltas/--freq-mask "
                "need --logmel")
    if args.id_col != "clip_id" and (
        args.trim_silence or args.normalize_dbfs is not None
        or args.min_tps is not None or args.chunk_ms is not None
        or args.time_mask is not None or args.speed_perturb
        or args.pack_ms is not None or args.logmel is not None
        or args.resample is not None
    ):
        p.error("--id-col other than clip_id is only supported for the "
                "batch/shard planning stages: the audio operators key "
                "on the input_hint schema's clip_id column")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("jepl-audio-prep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from jepl_spark.functions import audio_udfs as AU

    t0 = time.time()
    stages: dict = {}
    persisted = []

    def checkpoint_stage(frame, name):
        frame = frame.persist()
        persisted.append(frame)
        stages[name] = frame.count()
        return frame

    df = spark.read.parquet(args.input)
    if (
        args.batch_size is not None
        and "dur_ms" not in df.columns
        and args.chunk_ms is None
        and not args.speed_perturb
    ):
        # fail before any stage runs: duration batching needs dur_ms —
        # the input_hint clip schema carries one, and the chunk /
        # speed-perturb stages derive it for their re-keyed rows
        p.error("--batch-size needs a dur_ms column on the input (or a "
                "--chunk-ms / --speed-perturb stage that derives it)")
    stages["input"] = df.count()

    if args.resample is not None:
        df = checkpoint_stage(
            AU.resample_clips(df, target_sr=args.resample)
            .drop("n_samples"),
            "after_resample",
        )

    if args.trim_silence:
        trimmed = AU.trim_silence_clips(
            df, frame_ms=args.trim_frame_ms
        ).where(F.col("n_samples_out") > 0)
        if "dur_ms" in df.columns:
            # the cut changed the clip's real duration — refresh the
            # metadata column BEFORE dropping n_samples_out, or every
            # dur_ms consumer downstream (duration batching, the
            # padding report, dedup blocking) operates on pre-trim
            # values
            trimmed = trimmed.withColumn(
                "dur_ms",
                F.expr("n_samples_out * 1000 div sr_hz").cast("int"),
            )
        df = checkpoint_stage(
            trimmed.drop("lead_samples", "n_samples_out", "n_total"),
            "after_trim",
        )

    if args.normalize_dbfs is not None:
        # gain_db rides the row as the loudness audit column (note:
        # it is clip-level — a later chunking stage re-keys to chunk
        # rows, which do not carry it)
        df = checkpoint_stage(
            AU.normalize_gain_clips(df, target_dbfs=args.normalize_dbfs),
            "after_normalize",
        )

    if args.min_tps is not None:
        # only parameterize the rate pass when it actually runs here —
        # a pre-rated input (tokens_per_voiced_s present) computed its
        # rate elsewhere, and admit_paired_clips rejects stray kwargs
        rate_kwargs = (
            {} if "tokens_per_voiced_s" in df.columns
            else {"frame_ms": args.trim_frame_ms}
        )
        df = checkpoint_stage(
            AU.admit_paired_clips(df, min_tps=args.min_tps,
                                  max_tps=args.max_tps,
                                  **rate_kwargs)
            .where(F.col("reject_reason").isNull())
            .drop("voiced_ms", "n_tokens", "tokens_per_voiced_s",
                  "reject_reason"),
            "after_pair_gate",
        )

    if args.chunk_ms is not None:
        chunks = AU.chunk_clips(
            df, chunk_ms=args.chunk_ms, hop_ms=args.hop_ms,
            min_tail_ms=args.min_tail_ms,
        )
        if "transcript" in df.columns:
            chunks = AU.align_transcript_to_chunks(chunks)
        # the training unit is now the chunk: re-key and derive its
        # duration for the batching stages below
        df = checkpoint_stage(
            chunks.withColumn(
                args.id_col,
                F.concat_ws("#", F.col(args.id_col),
                            F.col("chunk_idx").cast("string")),
            ).withColumn(
                "dur_ms",
                (F.col("n_samples") * 1000 / F.col("sr_hz"))
                .cast("int"),
            ).drop("n_samples", "n_total"),
            "after_chunking",
        )

    if args.speed_perturb:
        # speed BEFORE masking: mask spans must live in the FINAL
        # timeline, and a perturbed copy's re-keyed id draws its own
        # deterministic masks
        sp = AU.speed_perturb_clips(df)
        # re-key per factor and rescale the duration metadata so the
        # batching stages see the perturbed lengths
        df = checkpoint_stage(
            sp.withColumn(
                args.id_col,
                F.concat_ws(
                    "@", F.col(args.id_col),
                    F.concat(F.col("factor_num").cast("string"),
                             F.lit("_"),
                             F.col("factor_den").cast("string")),
                ),
            ).withColumn(
                "dur_ms",
                (F.col("n_samples") * 1000 / F.col("sr_hz")).cast("int"),
            ).drop("factor_num", "factor_den", "n_samples"),
            "after_speed_perturb",
        )

    if args.time_mask is not None:
        df = checkpoint_stage(
            AU.time_mask_clips(df, n_masks=args.time_mask,
                               max_mask_ms=args.max_mask_ms,
                               seed=args.mask_seed),
            "after_time_mask",
        )

    if args.logmel is not None:
        # featurize AFTER every audio-domain stage so the features
        # reflect exactly the audio a trainer would consume (trims,
        # gain, perturbation, masks); runs off the same persisted
        # frame, so decodes are not repeated for earlier stage counts
        if args.logmel_fmax is None:
            # early-out probe: "is there more than one rate", not a
            # full distinct count of the corpus
            n_rates = len(df.select("sr_hz").distinct().head(2))
            if n_rates > 1:
                p.error(
                    "--logmel on a mixed-sample-rate corpus needs "
                    "--logmel-fmax (or resample first): without a "
                    "pinned upper edge, mel bin k covers different "
                    "frequencies at different rates"
                )
        feats = AU.logmel_clips(
            df.select(args.id_col, "bytes", "codec", "sr_hz"),
            n_mels=args.logmel, fmax=args.logmel_fmax,
            cmvn=args.logmel_cmvn,
        )
        if args.freq_mask is not None:
            # mask the base mel bands BEFORE deltas so the delta
            # channels are computed over the masked features (the
            # SpecAugment shape); per-epoch seeds draw fresh bands
            feats = AU.freq_mask_frames(
                feats, n_masks=args.freq_mask,
                max_mel_bins=args.freq_mask_bins, seed=args.mask_seed,
            )
        if args.logmel_deltas:
            from jepl_spark.operators.similarity import add_deltas

            feats = add_deltas(feats)
        if not args.report_only:
            feats.write.mode("overwrite").parquet(
                args.output + "_features"
            )
            feats = spark.read.parquet(args.output + "_features")
        stages["feature_frames"] = feats.count()

    if args.batch_size is not None:
        from jepl_spark.operators.batching import (
            batch_padding_report,
            duration_batches,
        )

        plan = duration_batches(
            df, batch_size=args.batch_size, bucket_ms=args.bucket_ms,
            id_col=args.id_col,
        )
        if not args.report_only:
            plan.write.mode("overwrite").parquet(args.output + "_batches")
            plan = spark.read.parquet(args.output + "_batches")
        rep = batch_padding_report(plan).agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("pad_ms").alias("total_pad_ms"),
            F.sum("sum_dur_ms").alias("total_dur_ms"),
        ).first()
        stages["batches"] = int(rep["n_batches"] or 0)
        stages["padding_overhead"] = (
            round(float(rep["total_pad_ms"]) / float(rep["total_dur_ms"]), 4)
            if rep["total_dur_ms"] else None
        )

    if args.shard_bytes is not None:
        from jepl_spark.operators.batching import assign_shards

        sized = df.withColumn("n_bytes", F.length("bytes"))
        manifest = assign_shards(
            sized, shard_bytes=args.shard_bytes, size_col="n_bytes",
            id_col=args.id_col,
        )
        if not args.report_only:
            manifest.write.mode("overwrite").parquet(
                args.output + "_shards"
            )
            manifest = spark.read.parquet(args.output + "_shards")
        stages["shards"] = manifest.select("group", "shard_idx") \
            .distinct().count()

    if args.pack_ms is not None:
        from jepl_spark.operators.batching import pack_clips

        if args.report_only:
            # the pack COUNT is a property of the metadata-only plan —
            # never pay the audio-byte exchange + payload concat just
            # to throw the packs away
            stages["packs"] = (
                pack_clips(df, budget_ms=args.pack_ms, plan_only=True)
                .select("sr_hz", "codec", "group", "pack_idx")
                .distinct().count()
            )
        else:
            packs = pack_clips(df, budget_ms=args.pack_ms)
            packs.write.mode("overwrite").parquet(args.output + "_packs")
            stages["packs"] = spark.read.parquet(
                args.output + "_packs"
            ).count()

    if not args.report_only:
        df.write.mode("overwrite").parquet(args.output)
        stages["written"] = spark.read.parquet(args.output).count()

    for f in persisted:
        f.unpersist()
    print(json.dumps({
        "stages": stages,
        "wall_s": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
