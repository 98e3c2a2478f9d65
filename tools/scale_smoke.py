"""Scale smoke: run the dedup / similarity lanes on a synthetic corpus
N× the sf0.1 fixtures to verify the operators' scale shape empirically
(no blowup in the banded/inverted-index self-joins, index build+query
cost) — receipts for the 100 TB design claims in README.md.

Usage: PYTHONPATH=. python tools/scale_smoke.py [n_docs] [n_vectors]
           [n_clips]
Prints one JSON line with per-lane wall seconds and output sizes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def synth_documents(spark, n_docs: int, dup_rate: float = 0.05):
    """Deterministic document corpus: templated sentences with planted
    near-duplicates (mapInPandas — distributed generation)."""
    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    words = [f"tok{i}" for i in range(5000)]

    def gen(batches):
        import random

        for pdf in batches:
            rows = {"doc_id": [], "text": []}
            for i in pdf["id"]:
                i = int(i)
                rng = random.Random(i if i % int(1 / dup_rate) else i - 1)
                n = 40 + rng.randrange(120)
                toks = [words[rng.randrange(len(words))] for _ in range(n)]
                if i % int(1 / dup_rate) == 0 and i > 0:
                    # near-dup of doc i-1: same seed stream, one edit
                    toks[len(toks) // 2] = "mutated"
                rows["doc_id"].append(i)
                rows["text"].append(" ".join(toks))
            yield pd.DataFrame(rows)

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    return spark.range(0, n_docs, numPartitions=64).mapInPandas(gen, schema=schema)


def synth_embeddings(spark, n: int, dim: int = 64):
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {"vec_id": [], "embedding": []}
            for i in ids:
                rng = np.random.RandomState(int(i) % 2**31)
                rows["vec_id"].append(int(i))
                rows["embedding"].append(rng.randn(dim).tolist())
            yield pd.DataFrame(rows)

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    return spark.range(0, n, numPartitions=64).mapInPandas(gen, schema=schema)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_clips = int(sys.argv[3]) if len(sys.argv) > 3 else 120_000
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from jepl_spark.operators import dedup as D
    from jepl_spark.operators import similarity as S

    work = tempfile.mkdtemp(prefix="scale-smoke-")
    res: dict = {"n_docs": n_docs, "n_vectors": n_vecs}

    # materialize inputs once (excluded from lane timings)
    docs_path = os.path.join(work, "docs")
    synth_documents(spark, n_docs).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    emb_path = os.path.join(work, "emb")
    synth_embeddings(spark, n_vecs).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)

    t0 = time.time()
    res["exact_dedup_groups"] = D.exact_dedup_stats(docs).count()
    res["exact_dedup_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    res["minhash_pairs"] = (
        D.minhash_candidates(docs, bands=16, num_hashes=64)
        .filter("est_jaccard >= 0.5").count()
    )
    res["minhash_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    res["ngram_pairs"] = D.ngram_jaccard_pairs(docs, min_jaccard=0.5).count()
    res["ngram_s"] = round(time.time() - t0, 1)

    qvec = emb.filter("vec_id = 0").collect()[0]["embedding"]
    t0 = time.time()
    idx = S.lsh_bucketize(emb, os.path.join(work, "idx"), planes=8, tables=4)
    res["index_build_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    res["index_topk_rows"] = idx.topk(spark, qvec, k=10).count()
    res["index_query_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    res["brute_topk_rows"] = S.brute_force_topk(emb, qvec, k=10).count()
    res["brute_query_s"] = round(time.time() - t0, 2)

    # round-3 lanes: bloom prune of the full corpus against a 1% key
    # subset (map-side, xxhash64 prod hasher) and token-window chunking
    from jepl_spark.operators import bloom as B
    from jepl_spark.operators import text as T

    t0 = time.time()
    keys = docs.where("doc_id % 100 = 0")
    words = B.collect_words(
        B.bloom_build(keys, "doc_id", n_bits=1 << 20, k=3,
                      hasher="xxhash64"),
        1 << 20,
    )
    res["bloom_build_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    res["bloom_kept"] = B.bloom_prune(
        docs, "doc_id", words, 1 << 20, 3, hasher="xxhash64"
    ).count()
    res["bloom_prune_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    res["doc_chunks"] = T.chunk_documents(
        docs, chunk_tokens=32, overlap_tokens=8, min_tail_tokens=4
    ).count()
    res["chunk_docs_s"] = round(time.time() - t0, 1)

    # round-4 lanes ---------------------------------------------------------
    from pyspark.sql import functions as F

    # winnowing fingerprints (Arrow numpy lane) + containment pairs
    t0 = time.time()
    res["winnow_fps"] = docs.select(
        F.explode(T.winnow_fingerprints(F.col("text"), k=8, window=4))
    ).count()
    res["winnow_s"] = round(time.time() - t0, 1)
    # this corpus is templated (char-level boilerplate everywhere), so
    # run the containment lane the way its contract says to run it on
    # boilerplate-heavy inputs: a tight df cap — work is Σ min(df,cap)²
    t0 = time.time()
    res["fp_overlap_pairs"] = T.fingerprint_overlap_pairs(
        docs, min_shared=20, max_fp_df=64
    ).count()
    res["fp_overlap_s"] = round(time.time() - t0, 1)

    # image dHash decode throughput (Arrow lane over real pixel bytes)
    from jepl_spark.functions import multimodal as M

    n_imgs = max(10_000, n_docs // 4)
    t0 = time.time()
    res["n_images"] = n_imgs
    res["image_dhash_rows"] = M.image_dhash(
        M.images_df(spark, n_imgs, partitions=64)
    ).count()
    res["image_dhash_s"] = round(time.time() - t0, 1)

    # banded Hamming search recall at scale: hash-spread signatures
    # (the linear synthetic pixel field yields near-identical dHashes —
    # giant identical-sig groups measure O(G²) pair listing, not the
    # banding) + planted 1-bit flips; recall must be exactly 1.0 and
    # random 64-bit sigs essentially never collide within 3 bits
    hashed = spark.range(n_imgs).select(
        F.col("id").alias("doc_id"), F.xxhash64("id").alias("dhash")
    )
    planted = hashed.where("doc_id % 50 = 0").select(
        (F.col("doc_id") + n_imgs * 10).alias("doc_id"),
        F.col("dhash").bitwiseXOR(F.lit(1)).alias("dhash"),
    )
    n_planted = planted.count()
    t0 = time.time()
    pairs = D.simhash_hamming_near_dups(
        hashed.unionByName(planted), max_hamming=3, bands=4,
        sig=F.col("dhash"),
    )
    found = pairs.where(
        (F.col("id_b") - F.col("id_a") == n_imgs * 10)
        & (F.col("hamming") == 1)
    ).count()
    res["dhash_pairs"] = pairs.count()
    res["dhash_planted_recall"] = round(found / max(1, n_planted), 4)
    res["dhash_search_s"] = round(time.time() - t0, 1)

    # decontamination of the full corpus against a ~2k-item benchmark
    # (prefixes of every 100th doc) — broadcast probe + one (id, count)
    # exchange; and the GPT-style packing manifest over all docs
    t0 = time.time()
    bench = docs.where("doc_id % 100 = 0").selectExpr(
        "substr(text, 1, 120) AS text"
    )
    res["decontam_flagged"] = D.decontaminate(
        docs, bench, n=8, min_hits=2
    ).count()
    res["decontam_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    toks = docs.select(
        "doc_id", T.token_count(F.col("text")).alias("__n")
    )
    res["packed_spans"] = T.pack_sequences(
        toks, "__n", budget=4096, shards=64
    ).count()
    res["pack_s"] = round(time.time() - t0, 1)

    # key-skew diagnostic after the TakeOrdered fix: ~n_docs·10 rows,
    # 40% on one hot key, ~1M distinct tail keys — the shape whose
    # single-partition rank funnel the round-3 version would hit
    from jepl_spark.operators import stats as ST

    skew_rows = spark.range(n_docs * 10, numPartitions=64).selectExpr(
        "CASE WHEN id % 10 < 4 THEN 'hot' "
        "ELSE CAST(id % 1000000 AS STRING) END AS k"
    )
    t0 = time.time()
    top = ST.key_skew_report(skew_rows, "k", top=10).collect()
    res["skew_report_s"] = round(time.time() - t0, 1)
    res["skew_top_share"] = round(max(r["share"] for r in top), 3)

    # round-5 lane: component resolution over a planted chain graph —
    # n_docs edges in chains of 64 (depth forces ~6 pointer-jump
    # rounds) plus the count of components must equal the planted
    # number exactly (any propagation defect merges or splits chains)
    chain_edges = spark.range(n_docs, numPartitions=64).selectExpr(
        "id AS id_a", "id + 1 AS id_b"
    ).where("(id % 64) != 63")
    n_chains = (n_docs + 63) // 64
    t0 = time.time()
    comp = D.near_dup_components(chain_edges)
    res["components_found"] = comp.select("component").distinct().count()
    res["components_s"] = round(time.time() - t0, 1)
    res["components_expected"] = n_chains
    assert res["components_found"] == n_chains, (
        res["components_found"], n_chains,
    )

    # round-5 lane: JPEG encode+decode+error transit throughput
    t0 = time.time()
    n_jpegs = max(2_000, n_docs // 50)
    errs = M.synth_roundtrip_errors(
        M.images_df(spark, n_jpegs, partitions=64, fmt_cycle=("jpeg",))
    )
    bad = errs.where("max_abs_err > 32 OR mean_abs_err > 4.0").count()
    res["n_jpegs"] = n_jpegs
    res["jpeg_out_of_bound"] = bad
    res["jpeg_s"] = round(time.time() - t0, 1)
    assert bad == 0

    # round-5 lane: per-domain cap over the full corpus (synthetic
    # URLs, ~1000 domains -> heavy groups exercise the salted pre-cut)
    from jepl_spark.operators import web as W

    t0 = time.time()
    urls = docs.selectExpr(
        "doc_id",
        "'https://www.d' || CAST(doc_id % 1000 AS STRING) || '.com/p/' "
        "|| CAST(doc_id AS STRING) AS url",
    )
    res["domain_cap_kept"] = W.per_domain_cap(
        urls, "url", "doc_id", cap=50
    ).count()
    res["domain_cap_s"] = round(time.time() - t0, 1)

    # round-5 late lanes: URL dedup and boilerplate strip at corpus scale
    t0 = time.time()
    d = F.col("doc_id")
    base_url = F.concat(F.lit("https://www.d"), (d % 997).cast("string"),
                        F.lit(".com/p/"), d.cast("string"))
    variant = F.concat(F.lit("https://WWW.d"), ((d - 1) % 997).cast("string"),
                       F.lit(".com/p/"), (d - 1).cast("string"),
                       F.lit("/?utm_source=x#f"))
    url = F.when((d % 7 == 3) & (d > 0), variant).otherwise(base_url)
    kept_urls = W.url_dedup(
        docs.withColumn("url", url).select("doc_id", "url")
    ).count()
    res["url_dedup_kept"] = kept_urls
    res["url_dedup_s"] = round(time.time() - t0, 1)
    # every variant doc (d%7==3, d>0) collapses onto doc d-1 exactly
    n_variants = sum(1 for i in range(1, n_docs) if i % 7 == 3)
    assert kept_urls == n_docs - n_variants, (kept_urls, n_docs - n_variants)

    t0 = time.time()
    aug = docs.withColumn(
        "text", F.concat(F.lit("SHARED NAV LINE\n"), F.col("text"),
                         F.lit("\nSHARED FOOTER LINE"))
    ).select("doc_id", "text")
    cleaned = T.strip_boilerplate_lines(aug, max_df=10)
    still_marked = cleaned.where(
        F.col("text").contains("SHARED NAV LINE")
        | F.col("text").contains("SHARED FOOTER LINE")
    ).count()
    res["boilerplate_rows"] = cleaned.count()
    res["boilerplate_residual"] = still_marked
    res["boilerplate_s"] = round(time.time() - t0, 1)
    assert still_marked == 0 and res["boilerplate_rows"] == n_docs

    # round-6 lane: stream_windowed_topk's per-batch rank under the
    # exact shape VERDICT r5 flagged — ONE closing window whose
    # distinct-key set is huge (~10⁶ "user ids" trending in a 6-hour
    # window).  The salted pre-cut must keep the final rank off the
    # single-task funnel; correctness: the planted top-k is exact.
    from jepl_spark.operators.stats import stream_windowed_topk

    class _CountSink:
        rows = None

        def write_batch(self, df, batch_id):
            self.rows = df.collect()

        def is_committed(self, batch_id):
            return False

    n_keys = max(1_000_000, n_docs)
    hot = 20  # keys 0..19 planted heavier than the uniform tail
    counts_batch = spark.range(n_keys, numPartitions=64).selectExpr(
        "timestamp '2024-01-01 00:00:00' AS window_start",
        "CAST(id AS STRING) AS k",
        f"CASE WHEN id < {hot} THEN 1000000 - id ELSE 1 + id % 97 END "
        "AS cnt",
    )
    csink = _CountSink()
    _, topk_fb = stream_windowed_topk(
        spark.readStream.format("rate").load().selectExpr(
            "timestamp AS ts", "CAST(value AS STRING) AS k"
        ),
        "k", csink, k=10,
    )
    t0 = time.time()
    topk_fb(counts_batch, 0)
    res["topk_skew_keys"] = n_keys
    res["topk_skew_s"] = round(time.time() - t0, 1)
    got_topk = [r["k"] for r in sorted(csink.rows, key=lambda r: r["rank"])]
    assert got_topk == [str(i) for i in range(10)], got_topk

    # round-6 lane: exact-substring dedup at corpus scale — every 9th
    # doc carries the same 12-token "license" run appended; after
    # dedup_substrings(k=8) NO document may still contain any 8-token
    # window of it (the near-dup plant pairs also share long runs and
    # are masked too — that IS the policy: remove all copies)
    t0 = time.time()
    lic = " ".join(f"lic{j}" for j in range(12))
    aug = docs.withColumn(
        "text",
        F.when((d % 9 == 2),
               F.concat(F.col("text"), F.lit(" " + lic)))
        .otherwise(F.col("text")),
    ).select("doc_id", "text")
    cleaned = D.dedup_substrings(aug, k=8)
    residual = cleaned.where(
        F.col("text").contains("lic0 lic1 lic2 lic3 lic4 lic5 lic6 lic7")
    ).count()
    res["substring_rows"] = cleaned.count()
    res["substring_residual"] = residual
    res["substring_s"] = round(time.time() - t0, 1)
    assert residual == 0 and res["substring_rows"] == n_docs

    # round-6 lane: duration bucketing + sized-shard export over 10⁶
    # metadata rows with a planted MEGA-bucket (40% of the corpus in
    # one duration bucket — the skew shape the shards knob exists
    # for).  Invariants checked by aggregation, nothing large
    # collects: every row assigned; per (shard, bucket) ≤ 1 short
    # batch and contiguous indexes; padding ≤ batch_size·(bucket-1);
    # per (group, shard) the boundary-overflow rule.
    from jepl_spark.operators.batching import (
        assign_shards,
        duration_batches,
        batch_padding_report,
    )

    n_meta = max(1_000_000, n_docs)
    meta = spark.range(n_meta, numPartitions=64).selectExpr(
        "'c' || CAST(id AS STRING) AS clip_id",
        "CAST(CASE WHEN id % 5 < 2 THEN 900 + id % 100 "
        "ELSE 1000 + (id * 53) % 50000 END AS INT) AS dur_ms",
    )
    t0 = time.time()
    b = duration_batches(meta, batch_size=32, bucket_ms=1000, shards=64)
    rep = batch_padding_report(b).persist()
    assigned = rep.agg(F.sum("n_clips")).first()[0]
    bad_groups = (
        rep.groupBy("shard", "bucket")
        .agg(
            F.sum(F.when(F.col("n_clips") < 32, 1).otherwise(0))
            .alias("shorts"),
            F.max("batch_idx").alias("mx"),
            F.count(F.lit(1)).alias("nb"),
        )
        .where((F.col("shorts") > 1) | (F.col("mx") != F.col("nb") - 1))
        .count()
    )
    max_pad = rep.agg(F.max("pad_ms")).first()[0]
    rep.unpersist()
    res["batching_rows"] = int(assigned)
    res["batching_s"] = round(time.time() - t0, 1)
    assert assigned == n_meta and bad_groups == 0, (assigned, bad_groups)
    assert max_pad <= 32 * 999, max_pad

    t0 = time.time()
    sh = assign_shards(
        meta.withColumn("n_bytes", F.col("dur_ms") * 32),
        shard_bytes=1 << 20, size_col="n_bytes", groups=64,
    )
    shards = (
        sh.groupBy("group", "shard_idx")
        .agg(F.max(F.col("group_offset") + F.col("n_bytes")).alias("end"),
             F.sum("n_bytes").alias("sz"), F.count(F.lit(1)).alias("n"))
        .persist()
    )
    n_sh_rows = shards.agg(F.sum("n")).first()[0]
    last = shards.groupBy("group").agg(F.max("shard_idx").alias("mx"))
    bad_bounds = (
        shards.join(last, "group")
        .where(
            (F.col("shard_idx") != F.col("mx"))
            & (F.col("end") < (F.col("shard_idx") + 1) * (1 << 20))
        )
        .count()
    )
    res["shard_count"] = shards.count()
    shards.unpersist()
    res["shard_export_s"] = round(time.time() - t0, 1)
    assert n_sh_rows == n_meta and bad_bounds == 0, (n_sh_rows, bad_bounds)

    # round-7 lanes: the byte-surgery / one-decode audio editors at
    # volume (the round-6 gates stop at 300-2,000 clips; the memory
    # shape in question is a whole encoded clip + decoded PCM per row
    # in flight through mapInPandas at 32 concurrent tasks).  Session
    # configs flip to the audio-heavy profile for this section only:
    # bounded Arrow batches (netty direct memory) and the row-based
    # parquet reader (the vectorized one builds giant binary column
    # vectors), then restore.
    from jepl_spark.functions.audio_udfs import (
        normalize_gain_clips,
        prepare_clips,
        speed_perturb_clips,
        time_mask_clips,
        trim_silence_clips,
    )
    from jepl_spark.sources.clips import clips_df

    res["n_clips"] = n_clips
    _saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            "spark.sql.parquet.enableVectorizedReader",
        )
    }
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    clips_path = os.path.join(work, "clips")
    clips_df(spark, n_clips).write.mode("overwrite").parquet(clips_path)
    clips = spark.read.parquet(clips_path)
    # page-cache warmup: pull every audio byte through the reader once
    # (JVM-only sum, no Python) so the FIRST timed lane doesn't carry
    # the cold multi-GB read the others then get from cache
    clips.select(F.sum(F.length("bytes"))).collect()

    t0 = time.time()
    trimmed = trim_silence_clips(clips)
    bad_trim = trimmed.where(
        (F.col("n_samples_out") > F.col("n_total"))
        | (F.col("lead_samples") + F.col("n_samples_out")
           > F.col("n_total"))
    ).count()
    res["trim_s"] = round(time.time() - t0, 1)
    res["trim_clips_per_s"] = round(n_clips / res["trim_s"], 0)
    assert bad_trim == 0

    t0 = time.time()
    masked = time_mask_clips(clips, n_masks=2, max_mask_ms=100)
    bad_mask = masked.where(F.size("masks") != 2).count()
    res["mask_s"] = round(time.time() - t0, 1)
    res["mask_clips_per_s"] = round(n_clips / res["mask_s"], 0)
    assert bad_mask == 0

    t0 = time.time()
    sped = speed_perturb_clips(clips)
    n_sp = sped.count()
    res["speed_s"] = round(time.time() - t0, 1)
    res["speed_clips_per_s"] = round(n_clips / res["speed_s"], 0)
    assert n_sp == 3 * n_clips, n_sp

    t0 = time.time()
    gained = normalize_gain_clips(clips)
    n_null_gain = gained.where(F.col("gain_db").isNull()).count()
    res["gain_s"] = round(time.time() - t0, 1)
    res["gain_clips_per_s"] = round(n_clips / res["gain_s"], 0)
    assert n_null_gain == 0, n_null_gain  # synth clips are never silent

    # fused prep at the same scale: quality + rate gate + trim + chunk
    # in ONE decode — output volume ≈ n_clips × windows
    t0 = time.time()
    prepped = prepare_clips(
        clips, min_tps=0.1, max_tps=100.0,
        chunk_ms=250, hop_ms=200, min_tail_ms=100,
    )
    n_chunks = prepped.count()
    res["prep_fused_s"] = round(time.time() - t0, 1)
    res["prep_fused_clips_per_s"] = round(n_clips / res["prep_fused_s"], 0)
    res["prep_fused_chunks"] = int(n_chunks)
    assert n_chunks > n_clips  # windows multiply admitted clips

    # full fbank featurization at the same scale: per-frame log-mel +
    # inline CMVN (one decode+FFT pass) → Δ/ΔΔ (one window exchange);
    # the output fan-out (~100 frame rows per second of audio, each a
    # 40-float array) is the memory shape under test — pinned fmax
    # because the corpus mixes 8k/16k/44.1k
    t0 = time.time()
    from jepl_spark.functions.audio_udfs import freq_mask_frames, logmel_clips
    from jepl_spark.operators.similarity import add_deltas

    feat_frames = add_deltas(freq_mask_frames(
        logmel_clips(clips, n_mels=40, fmax=4000.0, cmvn=True),
        n_masks=2, max_mel_bins=8,
    ))
    n_frames = feat_frames.count()
    res["logmel_s"] = round(time.time() - t0, 1)
    res["logmel_clips_per_s"] = round(n_clips / res["logmel_s"], 0)
    res["logmel_frames"] = int(n_frames)
    assert n_frames > 50 * n_clips  # ≥0.5 s of audio per clip at 10 ms hop

    # audio_prep job e2e at the same scale (report-only: per-stage
    # counts + batch plan, no multi-GB output write)
    import io
    from contextlib import redirect_stdout

    from jobs.audio_prep import main as prep_main

    t0 = time.time()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = prep_main([
            "--input", clips_path, "--report-only",
            "--trim-silence", "--time-mask", "2",
            "--batch-size", "16", "--bucket-ms", "500",
        ])
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    res["audio_prep_job_s"] = round(time.time() - t0, 1)
    res["audio_prep_stages"] = rep["stages"]
    assert rc == 0 and rep["stages"]["after_time_mask"] == n_clips

    for k, v in _saved.items():
        if v is not None:
            spark.conf.set(k, v)

    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
