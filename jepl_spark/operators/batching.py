"""Duration-bucketed training-batch assembly for audio corpora.

Speech models train on PADDED batches: every clip in a batch is padded
to the longest clip in it, so batching arbitrary-length clips together
burns compute on silence.  The standard cure (Kaldi / ESPnet style) is
duration bucketing — group clips of similar duration, batch within the
group — which bounds per-batch padding by the bucket width instead of
the corpus's full duration spread.

This module is the audio twin of ``text.pack_sequences`` (which cuts
token streams; clips cannot be cut across batches, so they bucket
instead) and shares its determinism recipe: ordering is a pure
function of the data — (md5-hash(seed, id), id, dur) — so re-runs,
different cluster sizes, and the DuckDB oracle all produce the
identical batch assignment.

The reference engine has no batching surface (it is a rule-evaluation
language); this lane is part of the mandated training-data-pipeline
axis over the north-rule clip table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duration_batches(
    df: DataFrame,
    batch_size: int,
    bucket_ms: int,
    shards: int = 64,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
    seed: str = "bucket",
) -> DataFrame:
    """Assign each clip to a fixed-size training batch of
    similar-duration clips.  Emits one row per clip:

      (id, shard, bucket, batch_idx, pos_in_batch, dur)

    where ``bucket = dur // bucket_ms`` (clips within one bucket
    differ by < ``bucket_ms``), and batches are consecutive
    ``batch_size`` runs of the bucket's deterministic
    (hash, id, dur) order.  The last batch of a (shard, bucket) may
    be short; per-batch padding is bounded by
    ``batch_size * bucket_ms`` regardless of the corpus's duration
    spread (see :func:`batch_padding_report`).

    Rows with NULL ids or non-positive durations drop out (nothing to
    batch; NULL ids hash to NULL like the SQL replay).

    Scale shape: rows carry (id, dur, hash) only — never audio bytes;
    ONE exchange on (shard, bucket) for the per-group row_number.
    The rank is sequential per (shard, bucket), so ``shards`` is the
    parallelism/skew knob: a mega-bucket (most of a speech corpus
    lands in a handful of duration ranges) splits across ``shards``
    independent tasks instead of funnelling through one — the same
    salting discipline as grouped_topk's pre-cut.  Batches never mix
    shards, which costs nothing: any deterministic partition of a
    bucket into batches is equally valid training input."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if bucket_ms <= 0:
        raise ValueError(f"bucket_ms must be positive, got {bucket_ms}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    from pyspark.sql.window import Window

    from jepl_spark.operators.sampling import _sample_hash

    base = (
        df.select(
            F.col(id_col),
            F.col(dur_col).cast("long").alias("__dur"),
            _sample_hash(F.col(id_col), seed).alias("__h"),
        )
        .where(F.col("__h").isNotNull() & (F.col("__dur") > 0))
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(shards)))
        .withColumn("bucket", (F.col("__dur") / F.lit(bucket_ms))
                    .cast("long"))
    )
    w = Window.partitionBy("shard", "bucket").orderBy(
        "__h", id_col, "__dur"
    )
    rn = F.row_number().over(w) - F.lit(1)
    return base.select(
        F.col(id_col),
        "shard",
        "bucket",
        (rn / F.lit(batch_size)).cast("long").alias("batch_idx"),
        F.pmod(rn, F.lit(batch_size)).alias("pos_in_batch"),
        F.col("__dur").alias(dur_col),
    )


def assign_shards(
    df: DataFrame,
    shard_bytes: int,
    size_col: str,
    id_col: str = "clip_id",
    groups: int = 64,
    seed: str = "shard",
) -> DataFrame:
    """Assign rows to approximately-``shard_bytes``-sized output
    shards for training-data export (the WebDataset/tar-shard shape:
    a dataloader streams whole shards, so shards should be uniformly
    sized and rows must never split across two).  Emits the input's
    id and size plus

      (group, shard_idx, group_offset)

    where rows are taken in the deterministic (md5-hash, id, size)
    order WITHIN a hash group and a row belongs to the shard its
    START offset falls in: ``shard_idx = group_offset div
    shard_bytes``.  A shard therefore overflows by at most one row —
    the standard never-split compromise — and every shard except a
    group's last holds ≥ ``shard_bytes - max_row_size + 1`` bytes.
    ``group_offset`` is the row's start in the group's concatenated
    byte stream (shard boundaries are NOT aligned to it once a row
    overflows — a sequential shard writer keeps its own in-file
    counter, which the deterministic order makes reproducible).

    Rows with NULL ids or non-positive sizes drop out.  Determinism:
    same recipe as :func:`duration_batches` / ``text.pack_sequences``
    — a pure function of the data, invariant to partitioning and
    cluster size, SQL-replayable.

    Scale shape: rows carry (id, size, hash) only; ONE exchange on
    ``group`` for the per-group running sum.  The cumulative sum is
    sequential per group, so ``groups`` is the parallelism knob —
    size it to the cluster's task slots; shard numbering is
    per-group, so writers parallelize over (group, shard_idx)."""
    if shard_bytes <= 0:
        raise ValueError(f"shard_bytes must be positive, got {shard_bytes}")
    if groups <= 0:
        raise ValueError(f"groups must be positive, got {groups}")
    from pyspark.sql.window import Window

    from jepl_spark.operators.sampling import _sample_hash

    base = (
        df.select(
            F.col(id_col),
            F.col(size_col).cast("long").alias("__sz"),
            _sample_hash(F.col(id_col), seed).alias("__h"),
        )
        .where(F.col("__h").isNotNull() & (F.col("__sz") > 0))
        .withColumn("group", F.pmod(F.col("__h"), F.lit(groups)))
    )
    w = (
        Window.partitionBy("group")
        .orderBy("__h", id_col, "__sz")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("__sz").over(w) - F.col("__sz")).alias("__start")
    return (
        base.withColumn("__start", start)
        .select(
            F.col(id_col),
            "group",
            F.expr(f"__start div {int(shard_bytes)}").alias("shard_idx"),
            F.col("__start").alias("group_offset"),
            F.col("__sz").alias(size_col),
        )
    )


def batch_padding_report(
    batches: DataFrame,
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Per-batch padding accounting over :func:`duration_batches`
    output: (shard, bucket, batch_idx, n_clips, max_dur_ms,
    sum_dur_ms, pad_ms) with ``pad_ms = n_clips * max_dur_ms -
    sum_dur_ms`` — exactly the wasted compute a padded training step
    spends on this batch.  One partial-aggregated exchange on the
    batch key; the report is ~corpus_size / batch_size rows."""
    return (
        batches.groupBy("shard", "bucket", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.max(dur_col).alias("max_dur_ms"),
            F.sum(dur_col).alias("sum_dur_ms"),
        )
        .withColumn(
            "pad_ms",
            F.col("n_clips") * F.col("max_dur_ms") - F.col("sum_dur_ms"),
        )
    )
