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



def _start_offsets(
    df: DataFrame,
    id_col: str,
    size_col: str,
    groups: int,
    seed: str,
    partition_cols: tuple = (),
    carry_cols: tuple = (),
) -> DataFrame:
    """The shared never-split planner prologue of :func:`assign_shards`
    and :func:`pack_clips` (ONE definition — the 'same deterministic
    recipe' cross-references stay true by construction): project
    (id, __sz, __h), drop NULL ids / non-positive sizes, md5-hash
    group, and the running start offset in the group's deterministic
    (hash, id, size) order, partitioned by ``partition_cols + group``.
    Returns (partition_cols..., carry_cols..., id, group, __sz, __h,
    __start).  ``carry_cols`` ride the projection — and therefore the
    ONE window exchange — untouched: pack_clips carries the audio
    bytes here so its per-pack groupBy (a refinement of the window
    keys) reuses this exchange instead of shuffling bytes twice."""
    from pyspark.sql.window import Window

    from jepl_spark.operators.sampling import _sample_hash

    base = (
        df.select(
            *partition_cols,
            *carry_cols,
            F.col(id_col),
            F.col(size_col).cast("long").alias("__sz"),
            _sample_hash(F.col(id_col), seed).alias("__h"),
        )
        .where(F.col("__h").isNotNull() & (F.col("__sz") > 0))
        .withColumn("group", F.pmod(F.col("__h"), F.lit(groups)))
    )
    w = (
        Window.partitionBy(*partition_cols, "group")
        .orderBy("__h", id_col, "__sz")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.withColumn(
        "__start", F.sum("__sz").over(w) - F.col("__sz")
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
    return _start_offsets(df, id_col, size_col, groups, seed).select(
        F.col(id_col),
        "group",
        F.expr(f"__start div {int(shard_bytes)}").alias("shard_idx"),
        F.col("__start").alias("group_offset"),
        F.col("__sz").alias(size_col),
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


_BYTES_PER_SAMPLE = {"pcm16": 2, "ulaw": 1, "alaw": 1}


def pack_clips(
    clips: DataFrame,
    budget_ms: int,
    id_col: str = "clip_id",
    groups: int = 64,
    seed: str = "pack",
    plan_only: bool = False,
) -> DataFrame:
    """Pack WHOLE clips into ~``budget_ms`` training examples — the
    audio twin of ``text.pack_sequences`` with the never-split rule of
    :func:`assign_shards` (a clip is an atomic training unit; Whisper-
    style 30 s examples are the canonical shape).  Emits ONE row per
    pack:

      (sr_hz, codec, group, pack_idx, n_clips, n_samples, bytes,
       manifest: array<(clip_id, offset_samples, n_samples)>)

    Pack assignment is the shared deterministic recipe (md5-hash
    group, (hash, id, dur) order, running duration cumsum, start-
    offset rule — a pack overflows by at most one clip) computed over
    (id, dur_ms) metadata ONLY and keyed per (sr_hz, codec) family, so
    a pack never mixes sample rates or codecs.  ``bytes`` is the
    clips' encoded payloads CONCATENATED in pack order — same-codec
    fixed-bytes-per-sample concat is exact byte surgery, NO decode,
    and the manifest offsets are byte-true (recomputed from actual
    payload lengths, not from the dur_ms metadata the plan trusted).

    Contract: raw codecs only (pcm16 / G.711) — the shape of
    chunk_clips / prepare_clips output.  A 'wav' container row raises
    (its pack family would depend on header contents; unwrap or
    re-chunk first).  NULL ids and non-positive durations drop, as in
    the other planners.

    Scale shape: the plan is ids+longs with ONE exchange; the
    materialization is THE one place audio bytes shuffle — inherent
    to physically building the example (bytes must co-locate), each
    task holds exactly one pack (≈ budget_ms of audio), and
    parallelism = number of packs.  ``plan_only=True`` returns the
    per-clip assignment frame (id, sr_hz, codec, group, pack_idx —
    ids+longs, no byte exchange) for reporting/auditing without
    materializing a single pack."""
    if budget_ms <= 0:
        raise ValueError(f"budget_ms must be positive, got {budget_ms}")
    if groups <= 0:
        raise ValueError(f"groups must be positive, got {groups}")
    for col in (id_col, "bytes", "codec", "sr_hz", "dur_ms"):
        if col not in clips.columns:
            raise ValueError(f"pack_clips needs column {col!r}")
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    planned = _start_offsets(
        clips, id_col, "dur_ms", groups, seed,
        partition_cols=("sr_hz", "codec"), carry_cols=("bytes",),
    ).withColumn(
        "pack_idx", F.expr(f"__start div {int(budget_ms)}")
    )
    if plan_only:
        return planned.select(
            id_col, "sr_hz", "codec", "group", "pack_idx"
        )

    out_schema = StructType([
        StructField("sr_hz", IntegerType()),
        StructField("codec", StringType()),
        StructField("group", IntegerType()),
        StructField("pack_idx", LongType()),
        StructField("n_clips", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("bytes", BinaryType()),
        StructField(
            "manifest",
            ArrayType(StructType([
                StructField("clip_id", StringType()),
                StructField("offset_samples", LongType()),
                StructField("n_samples", LongType()),
            ])),
        ),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__h", id_col, "__sz"])
        codec = str(pdf["codec"].iloc[0])
        bps = _BYTES_PER_SAMPLE.get(codec)
        if bps is None:
            raise ValueError(
                f"pack_clips supports raw codecs only "
                f"({sorted(_BYTES_PER_SAMPLE)}), got {codec!r} — unwrap "
                f"containers (or re-chunk) before packing"
            )
        payloads = [bytes(b) for b in pdf["bytes"]]
        manifest, off = [], 0
        for cid, b in zip(pdf[id_col], payloads):
            if len(b) % bps:
                # a byte-length that is not a whole number of samples
                # would silently desync every LATER clip's manifest
                # offset from the blob (cursor in samples, blob in
                # bytes) — fail on the corrupt clip instead
                raise ValueError(
                    f"pack_clips: clip {cid!r} has {len(b)} bytes, not "
                    f"a multiple of {bps} bytes/sample for {codec!r} — "
                    f"corrupt or mislabeled payload"
                )
            n = len(b) // bps
            manifest.append(
                {"clip_id": cid, "offset_samples": off, "n_samples": n}
            )
            off += n
        return pd.DataFrame([{
            "sr_hz": int(pdf["sr_hz"].iloc[0]),
            "codec": codec,
            "group": int(pdf["group"].iloc[0]),
            "pack_idx": int(pdf["pack_idx"].iloc[0]),
            "n_clips": len(payloads),
            "n_samples": off,
            "bytes": b"".join(payloads),
            "manifest": manifest,
        }])

    return planned.groupBy(
        "sr_hz", "codec", "group", "pack_idx"
    ).applyInPandas(build, schema=out_schema)


def unpack_clips(packs: DataFrame) -> DataFrame:
    """Inverse of :func:`pack_clips`: re-emit one row per packed clip
    by PURE-JVM byte slicing of the pack payload at the byte-true
    manifest offsets — no Python, no decode, whole-stage codegen.
    Output: (clip_id, sr_hz, codec, bytes, n_samples, dur_ms) with
    ``bytes`` BIT-IDENTICAL to what went in (same-codec fixed-bytes
    slicing is exact; the roundtrip gate pins it).  The dataloader
    shape: a trainer that consumed packs can always recover the
    constituent examples without touching audio codecs."""
    for col in ("codec", "sr_hz", "bytes", "manifest"):
        if col not in packs.columns:
            raise ValueError(
                f"unpack_clips needs pack_clips output (missing {col!r})"
            )
    # derive bytes/sample from the SAME table pack_clips packs with —
    # a codec pack_clips doesn't know cannot appear in its output, so
    # anything else here is a hand-built frame: raise, don't guess
    bps = None
    for c, b in _BYTES_PER_SAMPLE.items():
        cond = F.when(F.col("codec") == c, F.lit(b))
        bps = cond if bps is None else bps.when(F.col("codec") == c, F.lit(b))
    bps = bps.otherwise(
        F.raise_error(
            F.concat(F.lit("unpack_clips: unknown codec "), F.col("codec"))
        ).cast("int")
    )
    m = F.explode("manifest").alias("m")
    return (
        packs.select("sr_hz", "codec", "bytes", m)
        .withColumn("__bps", bps)
        .select(
            F.col("m.clip_id").alias("clip_id"),
            "sr_hz",
            "codec",
            F.expr(
                "substring(bytes, "
                "cast(m.offset_samples * __bps + 1 as int), "
                "cast(m.n_samples * __bps as int))"
            ).alias("bytes"),
            F.col("m.n_samples").alias("n_samples"),
            F.expr("m.n_samples * 1000 div sr_hz").cast("int")
            .alias("dur_ms"),
        )
    )
