"""Training-corpus curation pipeline, packaged for spark-submit.

    spark-submit --master <cluster> --py-files jepl_spark.zip \\
        jobs/corpus_pipeline.py \\
        --input <documents.parquet> --output <dir> \\
        [--min-tokens 5] [--max-punct-ratio 0.3] \\
        [--langs en,fr,es,de] \\
        [--near-dup-threshold 0.8] [--minhash-bands 16] \\
        [--near-dedup-policy pairs|components] \\
        [--url-col url] [--html-col html] [--fix-encoding] \\
        [--boilerplate-max-df N] [--max-oov-rate R] \\
        [--substring-dedup-k 20] \\
        [--audit-output <dir>] \\
        [--decontam-input <benchmark.parquet>] \\
        [--split train=0.9,val=0.1] [--chunk-tokens 512 | --pack-budget 4096] \\
        [--report-only]

Composes the library's text/dedup operators into the standard curation
sequence a large-scale training-data pipeline runs, in the order that
minimizes work for the expensive stages:

  1. quality gate   — pure JVM projections (length/token/punct ratios):
                      cheapest filter first, cuts the corpus before
                      anything shuffles
  2. language gate  — lang_id allowlist (still per-row JVM, no shuffle)
  3. exact dedup    — one shuffle on the 128-bit content hash
  4. near-dup dedup — MinHash+LSH banding (skew-capped); only the
                      survivors of 1-3 pay the signature cost

Each stage's row count is reported in one JSON line at exit, so a run
doubles as a corpus-quality report (--report-only skips the write).

Scale notes: every stage is either a per-row projection or a
banded/capped shuffle of ids+hashes — no stage materializes text on
the shuffle or collects to the driver; output is written partitioned
by language for downstream partition-pruned reads.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-punct-ratio", type=float, default=0.3)
    p.add_argument("--langs", default=None,
                   help="comma-separated allowlist, e.g. en,fr ('und' is "
                        "always dropped when this is set)")
    p.add_argument("--near-dup-threshold", type=float, default=0.8)
    p.add_argument("--minhash-bands", type=int, default=16)
    p.add_argument("--minhash-hashes", type=int, default=64)
    p.add_argument("--near-dedup-policy", choices=["pairs", "components"],
                   default="pairs",
                   help="pairs: drop docs with a lower-id near-neighbor; "
                        "components: resolve connected components of the "
                        "near-dup graph and keep one canonical doc per "
                        "fuzzy cluster")
    p.add_argument("--report-only", action="store_true")
    p.add_argument("--url-col", default=None,
                   help="run URL-level dedup first (canonical_url + "
                        "min-id per canonical) on this column")
    p.add_argument("--html-col", default=None,
                   help="input is crawled markup in this column: extract "
                        "text (tag/script/style strip, entity decode, "
                        "block tags -> newlines) into --text-col before "
                        "any content stage runs; the markup column is "
                        "dropped after extraction")
    p.add_argument("--fix-encoding", action="store_true",
                   help="repair UTF-8-read-as-cp1252 mojibake and strip "
                        "stray control chars in --text-col right after "
                        "extraction, before any content stage")
    p.add_argument("--nfc", action="store_true",
                   help="Unicode NFC normalization of --text-col right "
                        "after encoding repair: canonical composition so "
                        "visually identical docs hash/tokenize alike")
    p.add_argument("--epoch-weights", default=None,
                   help="JSON object of per-source epoch weights (e.g. "
                        "'{\"wiki\": 3.0, \"crawl\": 0.5}'): materialize "
                        "the training mixture as the FINAL stage — rows "
                        "duplicated per weight with an `epoch` column; "
                        "unlisted sources default to 1.0")
    p.add_argument("--epoch-source-col", default="source")
    p.add_argument("--boilerplate-max-df", type=int, default=None,
                   help="strip lines appearing in more than this many "
                        "distinct docs (before the quality gate, so "
                        "nav/footer lines cannot pollute its ratios)")
    p.add_argument("--max-oov-rate", type=float, default=None,
                   help="drop docs whose out-of-vocabulary rate vs the "
                        "surviving corpus vocabulary exceeds this")
    p.add_argument("--oov-vocab-k", type=int, default=50_000)
    p.add_argument("--audit-output", default=None,
                   help="also write every DROPPED doc id with the stage "
                        "that dropped it (drop_reason) to this dir — the "
                        "curation audit trail")
    p.add_argument("--split", default=None,
                   help="comma-separated name=weight list (weights sum to "
                        "1), e.g. train=0.9,val=0.05,test=0.05 — adds a "
                        "deterministic hash-split column (stable under "
                        "corpus growth/repartition)")
    p.add_argument("--chunk-tokens", type=int, default=None,
                   help="if set, the written output is token-window CHUNKS "
                        "of the curated docs (context-window prep) instead "
                        "of whole documents")
    p.add_argument("--chunk-overlap", type=int, default=0)
    p.add_argument("--chunk-min-tail", type=int, default=1)
    p.add_argument("--substring-dedup-k", type=int, default=None,
                   help="exact-substring dedup: remove every token "
                        "covered by a duplicated k-token window "
                        "(corpus-wide multiplicity; Lee et al. 2022)")
    p.add_argument("--substring-max-occurrences", type=int, default=1)
    p.add_argument("--lm-ref-input", default=None,
                   help="parquet of clean reference text (same text "
                        "column): train a bigram LM on it and drop docs "
                        "whose smoothed avg bigram log-prob falls below "
                        "--lm-min-logp (CCNet-style quality filter)")
    p.add_argument("--lm-min-logp", type=float, default=None)
    p.add_argument("--decontam-input", default=None,
                   help="parquet of benchmark/eval rows (same text "
                        "column): docs sharing >= --decontam-min-hits "
                        "distinct --decontam-ngram word n-grams with any "
                        "benchmark row are removed after dedup")
    p.add_argument("--decontam-ngram", type=int, default=8)
    p.add_argument("--decontam-min-hits", type=int, default=2)
    p.add_argument("--pack-budget", type=int, default=None,
                   help="if set, additionally write a training-sequence "
                        "packing manifest (GPT-style concatenate+cut at "
                        "this token budget) to <output>_packing")
    p.add_argument("--pack-shards", type=int, default=64)
    args = p.parse_args(argv)
    if not args.report_only and not args.output:
        p.error("--output is required unless --report-only")
    if args.pack_budget is not None and args.chunk_tokens is not None:
        p.error("--pack-budget packs whole curated documents; combine "
                "with --chunk-tokens is not supported (chunks are "
                "already fixed-budget windows)")
    if args.pack_budget is not None and args.report_only:
        p.error("--pack-budget writes a manifest; drop --report-only")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jepl_spark.operators import dedup as D
    from jepl_spark.operators import text as T

    spark = SparkSession.builder.appName("jepl-corpus-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    stages: dict[str, int] = {}
    persisted = []
    audits: list = []

    def audited(before, after, reason):
        """Record (id, drop_reason) for rows `before` has and `after`
        lacks.  Lazy — the anti-joins execute only in the final audit
        write, against persisted stage boundaries where they exist."""
        if args.audit_output:
            audits.append((
                reason,
                before.select(args.id_col).join(
                    after.select(args.id_col), args.id_col, "left_anti"
                ),
            ))
        return after

    def checkpoint_stage(frame, name):
        """Persist a stage boundary so per-stage counts and downstream
        stages do not re-execute the upstream lineage (scan + quality +
        lang projections would otherwise run once per count plus once
        for the final write)."""
        frame = frame.persist()
        persisted.append(frame)
        stages[name] = frame.count()
        return frame

    df = spark.read.parquet(args.input)
    stages["input"] = df.count()

    # 0a. URL-level dedup — the cheapest dedup there is (no content
    #     is touched): utm/fragment/www variants of one page collapse
    #     before their text costs anything downstream
    if args.url_col:
        from jepl_spark.operators import web as W

        df = checkpoint_stage(
            audited(df, W.url_dedup(df, args.url_col, args.id_col),
                    "url_dedup"),
            "after_url_dedup",
        )

    # 0b. HTML→text extraction — AFTER url dedup (collapsed URL
    #     variants never pay extraction), BEFORE every content stage
    #     (boilerplate df counts, quality ratios, lang_id, hashes all
    #     presuppose text, not markup).  Pure per-row projection the
    #     optimizer fuses with the scan; the raw markup column drops
    #     here so it never rides a shuffle or the output.
    if args.html_col:
        from jepl_spark.operators import web as W

        df = W.extract_html(df, html_col=args.html_col,
                            text_col=args.text_col)
        if args.html_col != args.text_col:
            df = df.drop(args.html_col)

    # 0b2. encoding repair — right after extraction, before every
    #      content stage: unrepaired mojibake inflates punct ratios /
    #      OOV rates and splits exact-dup groups.  Pure per-row JVM
    #      replace chain, fused with the scan; no shuffle.
    if args.fix_encoding:
        df = df.withColumn(args.text_col,
                           T.fix_encoding(F.col(args.text_col)))

    # 0b3. Unicode NFC — after encoding repair (mojibake fixes can
    #      emit decomposable sequences), before dedup/quality: NFC
    #      folds visually-identical variants onto one byte form
    if args.nfc:
        df = df.withColumn(args.text_col,
                           T.nfc_normalize(F.col(args.text_col)))

    # 0c. boilerplate strip — before the quality gate, so nav/footer
    #     lines cannot pollute the token/punct ratios it reads
    if args.boilerplate_max_df is not None:
        df = checkpoint_stage(
            T.strip_boilerplate_lines(
                df, args.boilerplate_max_df, args.text_col, args.id_col
            ),
            "after_boilerplate",
        )

    # 1. quality gate (per-row JVM; Catalyst fuses with the scan)
    q = T.quality_features(df, args.text_col)
    pre_quality = df
    df = (
        q.filter(
            (F.col("q_n_tokens") >= args.min_tokens)
            & (F.col("q_punct_ratio") <= args.max_punct_ratio)
        )
        .drop(*[c for c in q.columns if c.startswith("q_")])
    )
    df = audited(pre_quality, df, "quality")
    stages["after_quality"] = df.count()  # fused with the lang stage below

    # 2. language gate
    pre_lang = df
    df = df.withColumn("lang", T.lang_id(F.col(args.text_col)))
    if args.langs:
        allow = [x.strip() for x in args.langs.split(",") if x.strip()]
        df = audited(pre_lang, df.filter(F.col("lang").isin(allow)), "lang")
    # first persist point: everything above is per-row projection the
    # optimizer fuses into one scan; below it feeds multiple consumers
    df = checkpoint_stage(df, "after_lang")

    # 2a. (optional) OOV-rate gate: vocabulary from the SURVIVORS of
    #     the gates above, so junk the earlier stages dropped cannot
    #     vote tokens into the vocabulary
    if args.max_oov_rate is not None:
        vocab = T.top_tokens(df, args.text_col, k=args.oov_vocab_k)
        rates = T.oov_rate(df, vocab, args.text_col, args.id_col)
        keep = rates.where(
            F.col("oov_rate").isNull()
            | (F.col("oov_rate") <= args.max_oov_rate)
        ).select(args.id_col)
        df = checkpoint_stage(
            audited(df, df.join(keep, args.id_col, "left_semi"), "oov"),
            "after_oov",
        )

    # 3. exact dedup (one shuffle on the content hash; min-id wins)
    df = checkpoint_stage(
        audited(df, D.exact_dedup(df, args.text_col, args.id_col),
                "exact_dedup"),
        "after_exact_dedup",
    )

    # 4. near-dup dedup (MinHash+LSH candidates -> threshold -> drop
    #    per --near-dedup-policy: pair rule, or one canonical doc per
    #    connected component of the near-dup graph)
    df = audited(
        df,
        D.minhash_dedup(
            df, args.text_col, args.id_col,
            threshold=args.near_dup_threshold,
            bands=args.minhash_bands, num_hashes=args.minhash_hashes,
            policy=args.near_dedup_policy,
        ),
        "near_dedup",
    )
    df = checkpoint_stage(df, "after_near_dedup")

    # 4c. (optional) exact-substring dedup — Lee et al. 2022: remove
    #     every copy of any >= k-token run duplicated corpus-wide.
    #     AFTER doc-level dedup (survivors only pay the window-hash +
    #     multiplicity exchange) and BEFORE the LM filter, so scores
    #     read the deduplicated text.  Rewrites text in place; docs
    #     are never dropped here (a fully-duplicated doc becomes '').
    if args.substring_dedup_k is not None:
        df = checkpoint_stage(
            D.dedup_substrings(
                df, k=args.substring_dedup_k,
                max_occurrences=args.substring_max_occurrences,
                text_col=args.text_col, id_col=args.id_col,
            ),
            "after_substring_dedup",
        )

    # 4a. (optional) LM quality filter — CCNet-style: bigram model
    #     trained on the clean reference corpus ranks the survivors
    if args.lm_ref_input:
        if args.lm_min_logp is None:
            p.error("--lm-ref-input requires --lm-min-logp")
        lm = T.lm_train(spark.read.parquet(args.lm_ref_input),
                        text_col=args.text_col, hash_keys=True)
        scores = T.lm_score(df, lm, text_col=args.text_col,
                            id_col=args.id_col)
        # NULL score = < 2 tokens = no evidence (lm_score's contract):
        # keep those docs rather than conflating "unscorable" with
        # "low quality" — the token-count quality gate already owns
        # too-short filtering
        good = scores.where(
            F.col("avg_logp").isNull()
            | (F.col("avg_logp") >= args.lm_min_logp)
        ).select(args.id_col)
        df = checkpoint_stage(
            audited(df, df.join(good, on=args.id_col, how="inner"),
                    "lm_filter"),
            "after_lm_filter",
        )

    # 4b. (optional) benchmark decontamination — remove docs sharing
    #     n-gram content with the eval set (after dedup: survivors only
    #     pay the shingle cost)
    if args.decontam_input:
        bench = spark.read.parquet(args.decontam_input)
        df = checkpoint_stage(
            audited(
                df,
                D.decontaminate(
                    df, bench, text_col=args.text_col, id_col=args.id_col,
                    bench_text_col=args.text_col, n=args.decontam_ngram,
                    min_hits=args.decontam_min_hits, return_clean=True,
                ),
                "decontam",
            ),
            "after_decontam",
        )

    # 5. (optional) deterministic train/val/test split — assigned AFTER
    #    dedup so near-identical docs cannot land in different splits
    if args.split:
        from jepl_spark.operators import sampling as SA

        weights = {}
        for part in args.split.split(","):
            if "=" not in part:
                p.error(f"--split: expected name=weight, got {part!r}")
            name, _, w = part.partition("=")
            name = name.strip()
            if name in weights:
                p.error(f"--split: duplicate split name {name!r}")
            try:
                weights[name] = float(w)
            except ValueError:
                p.error(f"--split: weight for {name!r} is not a number: {w!r}")
        df = SA.hash_split(df, args.id_col, weights)

    # 6. (optional) chunk the curated documents into token windows —
    #    the written unit becomes a training example, not a document
    if args.chunk_tokens is not None:
        # 'source' must survive chunking: the epoch-weighting stage
        # (8) keys on it, and --chunk-tokens + --epoch-weights is a
        # valid combination
        carry = [c for c in ("lang", "split", "source")
                 if c in df.columns]
        chunks = T.chunk_documents(
            df, id_col=args.id_col, text_col=args.text_col,
            chunk_tokens=args.chunk_tokens,
            overlap_tokens=args.chunk_overlap,
            min_tail_tokens=args.chunk_min_tail,
        )
        df = checkpoint_stage(
            chunks.join(df.select(args.id_col, *carry), on=args.id_col),
            "chunks",
        )

    # 7. (optional) sequence-packing manifest: shard/seq/offset spans
    #    over the curated docs' token streams — the export unit a
    #    trainer consumes next to the doc parquet
    if args.pack_budget is not None:
        toks = df.select(
            args.id_col,
            T.token_count(F.col(args.text_col)).alias("__n_tok"),
        )
        spans = T.pack_sequences(
            toks, "__n_tok", budget=args.pack_budget,
            id_col=args.id_col, shards=args.pack_shards,
        )
        spans.write.mode("overwrite").parquet(args.output + "_packing")
        stages["packed_spans"] = spark.read.parquet(
            args.output + "_packing"
        ).count()

    # 8. (optional) training-mixture assembly: per-source epoch
    #    weights materialized as duplicated rows + epoch index — the
    #    LAST stage, so every copy is of a fully curated doc
    if args.epoch_weights:
        import json as _json

        from jepl_spark.operators.sampling import epoch_mix

        weights = _json.loads(args.epoch_weights)
        if not isinstance(weights, dict):
            p.error("--epoch-weights must be a JSON object")
        df = epoch_mix(
            df, {k: float(v) for k, v in weights.items()},
            source_col=args.epoch_source_col, id_col=args.id_col,
        )
        stages["after_epoch_mix"] = df.count()

    if not args.report_only:
        # partitioned by language: downstream per-language reads prune
        part_cols = [c for c in ("split", "lang") if c in df.columns]
        writer = df.repartition(*part_cols) if part_cols else df
        w = writer.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(args.output)

    out = {
        "stages": stages,
        "kept_fraction": (
            round(stages["after_near_dedup"] / stages["input"], 4)
            if stages["input"] else None
        ),
        "wall_s": round(time.time() - t0, 2),
        "output": None if args.report_only else args.output,
    }

    # curation audit trail: every dropped id with the stage that
    # dropped it — one parquet, one union of per-stage anti-joins
    # (each against a persisted boundary), counts echoed in the report
    if args.audit_output:
        if audits:
            audit_df = audits[0][1].withColumn(
                "drop_reason", F.lit(audits[0][0])
            )
            for reason, dropped in audits[1:]:
                audit_df = audit_df.unionByName(
                    dropped.withColumn("drop_reason", F.lit(reason))
                )
            audit_df.write.mode("overwrite").parquet(args.audit_output)
            counts = (
                spark.read.parquet(args.audit_output)
                .groupBy("drop_reason").count().collect()
            )
            out["dropped"] = {r["drop_reason"]: r["count"] for r in counts}
        else:
            out["dropped"] = {}
        out["audit_output"] = args.audit_output

    for frame in persisted:
        frame.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
