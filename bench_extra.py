"""Extra benchmarks for optimization work (guide §1.4 noop-sink
isolation).  NOT part of the driver contract — bench.py stays frozen.

Usage:
    python bench_extra.py LANE [LANE ...] [--sf SFDIR] [--reps N]
        [--explain OUTDIR]

Runs the named bench.py lanes (same definitions, same noop sink) in a
fresh session at the given scale dir, printing per-rep wall seconds.
With --explain, also writes each lane's .explain("formatted") to
OUTDIR/<lane>.txt where the lane exposes a DataFrame via a `_plan`
helper (see PLAN_FNS below).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen harness: reuse its lane defs)


def plan_frames(spark, sf_dir):
    """Lazy DataFrames mirroring the bench lanes, for explain capture
    (materialize=False where the operator supports it so the captured
    plan is the full lazy pipeline, not a checkpoint stub)."""
    from pyspark.sql import functions as F

    from jepl_spark.operators import dedup as D
    from jepl_spark.operators import text as T
    from jepl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    def ngram():
        return D.ngram_jaccard_pairs(docs, min_jaccard=0.2,
                                     materialize=False)

    def minhash():
        return D.minhash_candidates(docs, bands=16, num_hashes=64,
                                    materialize=False)

    def substring():
        return D.dedup_substrings(docs, k=8, materialize=False)

    def decontam():
        bench_df = docs.where(F.col("doc_id") % 97 == 0).select(
            F.substring(F.col("text"), 1, 120).alias("text"))
        return D.decontaminate(docs, bench_df, n=8, min_hits=2)

    def wer():
        ref_t = T._tokens(F.col("text"))
        kept = F.filter(
            F.transform(ref_t, lambda t, i: F.when(
                ((i + 1) % 7) == 0, F.reverse(t)).otherwise(t)),
            lambda t, i: ((i + 1) % 3) != 0,
        )
        pairs = docs.select(
            "doc_id", "text", F.concat_ws(" ", kept).alias("hyp"))
        return T.transcript_wer(pairs, max_wer=0.45)

    def lm():
        lmt = T.lm_train(docs, hash_keys=True)
        return T.lm_score(docs, lmt)

    def fixenc():
        d = F.col("doc_id")
        tail = (
            F.when(d % 3 == 0, F.lit(" cafÃ© â‚¬9 â€” ok"))
            .when(d % 3 == 1, F.lit(" donâ€™t StraÃŸe"))
            .otherwise(F.lit(" clean"))
        )
        return docs.select(
            "doc_id", T.fix_encoding(F.concat(F.col("text"), tail)).alias("fixed"))

    def winnow():
        return docs.select(
            "doc_id",
            F.explode(T.winnow_fingerprints(F.col("text"))).alias("fp"))

    return {
        "ngram_jaccard": ngram,
        "minhash_near_dups": minhash,
        "substring_dedup": substring,
        "decontam": decontam,
        "transcript_wer": wer,
        "lm_score": lm,
        "fix_encoding": fixenc,
        "winnow_fps": winnow,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lanes", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None)
    args = ap.parse_args()

    spark = bench.make_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        qs = bench.batch_queries(spark, args.sf)
        if any(l in ("minhash_against", "audio_against") for l in args.lanes):
            bench.build_minhash_snapshot(spark, args.sf, qs)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            pf = plan_frames(spark, args.sf)
            for lane in args.lanes:
                if lane in pf:
                    df = pf[lane]()
                    with open(os.path.join(args.explain, f"{lane}.txt"),
                              "w") as fh:
                        fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                            df._jdf.queryExecution(), "formatted"))
                    print(f"explain written: {lane}")
        out = {}
        for lane in args.lanes:
            fn = qs[lane]
            times = []
            for _ in range(args.reps):
                import gc
                spark.catalog.clearCache()
                gc.collect()
                spark.sparkContext.setJobDescription(f"bench_extra:{lane}")
                t0 = time.time()
                fn()
                times.append(round(time.time() - t0, 3))
            out[lane] = times
            print(json.dumps({lane: times}), flush=True)
        print("TOTALS " + json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
