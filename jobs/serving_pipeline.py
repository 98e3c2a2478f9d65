"""ANN query-serving job, packaged for spark-submit — the third job of
the suite (ingest: clips_pipeline, curation: corpus_pipeline, serving:
this).

    spark-submit --master <cluster> --py-files jepl_spark.zip \\
        jobs/serving_pipeline.py \\
        --corpus <embeddings.parquet> --queries <dir-of-query-parquet> \\
        --sink <dir> --checkpoint <dir> \\
        [--k 10] [--max-files-per-trigger 1] \\
        [--index lsh --index-path <dir> --planes 8 --tables 4]
        [--index ivf --index-path <dir> --ivf-cells 16 --nprobe 4]

Pipeline: a file stream of query vectors → per-micro-batch exact
batched top-k against the static corpus (one broadcast pass per batch;
queries never shuffle the corpus) → exactly-once sink.  Per-query
results are independent, so output is batching-invariant and replays
are idempotent.  ``--index lsh`` / ``--index ivf`` build a
bucket- / cell-partitioned index and route each micro-batch through
ONE partition-pruned batched index-join job (topk_batch) instead of
the full corpus pass — the switch to flip when the corpus stops
fitting a per-batch scan.

Query parquet schema: (query_id: long, query_vec: array<float|double>).
One JSON line is printed at exit: batches committed, result rows,
wall seconds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--sink", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--index", choices=["brute", "lsh", "ivf"],
                   default="brute")
    p.add_argument("--index-path", default=None)
    p.add_argument("--planes", type=int, default=8)
    p.add_argument("--tables", type=int, default=4)
    p.add_argument("--ivf-cells", type=int, default=16)
    p.add_argument("--nprobe", type=int, default=4)
    args = p.parse_args(argv)
    if args.index in ("lsh", "ivf") and not args.index_path:
        p.error(f"--index {args.index} requires --index-path")

    from pyspark.sql import SparkSession
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    from jepl_spark.operators import similarity as S
    from jepl_spark.streaming.engine import file_stream, run_to_completion
    from jepl_spark.streaming.sink import IdempotentParquetSink

    spark = SparkSession.builder.appName("jepl-ann-serving").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    corpus = spark.read.parquet(args.corpus)
    scorer = None
    if args.index == "lsh":
        index = S.lsh_bucketize(
            corpus, args.index_path, planes=args.planes, tables=args.tables
        )

        def scorer(qdf):
            # ONE batched index-join job per micro-batch: union of the
            # queries' bucket partitions read once, queries broadcast-
            # joined on (table, bucket), exact rescore, per-query rank.
            # Handles the empty micro-batch (returns an empty frame).
            return index.topk_batch(spark, qdf, k=args.k)
    elif args.index == "ivf":
        index = S.ivf_build(corpus, args.index_path, n_cells=args.ivf_cells)

        def scorer(qdf):
            # same batched one-job shape, cell-pruned (IVF twin)
            return index.topk_batch(spark, qdf, k=args.k,
                                    nprobe=args.nprobe)

    schema = StructType([
        StructField("query_id", LongType()),
        StructField("query_vec", ArrayType(FloatType())),
    ])
    sink = IdempotentParquetSink(args.sink)
    fb = S.stream_topk_serving(corpus, sink, k=args.k, scorer=scorer)
    q = (
        file_stream(spark, args.queries, schema,
                    max_files_per_trigger=args.max_files_per_trigger)
        .writeStream.outputMode("append")
        .foreachBatch(fb)
        .option("checkpointLocation", args.checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q, timeout_s=3600)
    try:
        out_rows = sink.read_committed(spark).count()
        batches = sink.committed_count(spark)
    except ValueError:
        # nothing committed (e.g. an empty --queries directory): the
        # promised JSON summary still prints instead of a traceback
        out_rows, batches = 0, 0
    print(json.dumps({
        "batches": batches,
        "rows": out_rows,
        "k": args.k,
        "index": args.index,
        "wall_s": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
