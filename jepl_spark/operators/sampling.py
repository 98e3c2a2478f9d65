"""Deterministic hash-based sampling and dataset splits.

Training-data pipelines need samples and train/val/test splits that are
REPRODUCIBLE: re-running the job on the same corpus — or on the corpus
re-partitioned 1000 ways on a different cluster — must select exactly
the same rows.  ``DataFrame.sample`` cannot promise that (its Bernoulli
draw is seeded per partition, so any repartition reshuffles the
selection).  These operators decide membership from a deterministic
per-row hash of a caller-chosen identity column, so the selection is a
pure function of the data: partition-count-independent, resumable,
and exactly replayable in the DuckDB oracle.

Scale shape: ``hash_sample`` / ``hash_split`` / ``stratified_hash_sample``
are single-pass JVM filters — no shuffle, predicate-pushdown friendly,
linear in input splits.  ``deterministic_reservoir`` is one hash-ranked
window per key (one exchange on the key), bounded output k·|keys|.

Hash: the same md5 → first-15-hex-chars → 60-bit uniform integer used
by the KMV sketch (sketch.kmv_hash), so every membership decision is
`h(id) / 2^60 < fraction` with h replayable on any engine.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jepl_spark.operators.sketch import _DOMAIN, _groups, kmv_hash

GroupCols = Union[str, Sequence[str]]


def _sample_hash(id_col: Column, seed: str) -> Column:
    """60-bit uniform hash of (seed, id) — changing the seed draws an
    independent sample; DuckDB replay:
    CAST(('0x' || substr(md5(seed || ':' || id), 1, 15)) AS BIGINT).
    NULL-propagating (F.concat, not concat_ws): a NULL id hashes to
    NULL exactly like the SQL replay, so NULL-id rows drop out of
    samples/filters instead of all colliding on one sentinel hash."""
    return kmv_hash(F.concat(F.lit(seed + ":"), id_col.cast("string")))


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: str = "sample",
) -> DataFrame:
    """Keep rows whose hash falls below ``fraction`` of the domain.
    Deterministic in the row identity — independent of partitioning,
    ordering, and cluster size.  0 ≤ fraction ≤ 1."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(
        _sample_hash(F.col(id_col), seed) < F.lit(int(fraction * _DOMAIN))
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name ('train'/'val'/'test'/…) by
    cumulative hash thresholds.  Splits are disjoint, exhaustive, and
    deterministic: a row's split never changes when the corpus grows,
    shrinks, or is re-partitioned — the property that keeps eval sets
    uncontaminated across pipeline re-runs.  Weights must sum to 1
    (±1e-9); split boundaries follow the mapping's iteration order."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    h = _sample_hash(F.col(id_col), seed)
    # NULL ids get a NULL split, not a silent ride in the last bucket
    expr = F.when(h.isNull(), F.lit(None).cast("string"))
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        expr = expr.when(h < F.lit(int(cum * _DOMAIN)), F.lit(name))
    labeled = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, labeled)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: str = "stratified",
) -> DataFrame:
    """Per-stratum sampling rates (e.g. keep 100% of rare languages,
    1% of English) — the rebalancing step of corpus curation.  Still a
    pure JVM filter: the per-stratum threshold is a CASE expression,
    no shuffle, no join."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0, 1]")
    thr = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(name)
        lim = F.lit(int(frac * _DOMAIN))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    default_lim = F.lit(int(default_fraction * _DOMAIN))
    thr = default_lim if thr is None else thr.otherwise(default_lim)
    # seed the hash per stratum so resampling one stratum's rate does
    # not disturb which rows other strata keep.  NULL-propagating
    # F.concat (not concat_ws): a NULL stratum or id hashes to NULL and
    # the row drops out, matching the SQL replay, instead of every
    # NULL-id row in a stratum collapsing onto one sentinel hash.
    # Caveat: '|' inside values can alias identities across strata
    # (strata 'a|b' + id 'c' vs 'a' + 'b|c') — pass clean key columns.
    h = _sample_hash(
        F.concat(
            F.col(strata_col).cast("string"),
            F.lit("|"),
            F.col(id_col).cast("string"),
        ),
        seed,
    )
    return df.where(h < thr)


def deterministic_reservoir(
    df: DataFrame,
    id_col: str,
    k: int,
    group_by: Optional[GroupCols] = None,
    seed: str = "reservoir",
    rank_col: Optional[str] = None,
    partial_buckets: int = 32,
) -> DataFrame:
    """Uniform k rows without replacement (per group): rank rows by
    their hash and keep the k smallest — the deterministic equivalent
    of reservoir sampling, with the same marginal distribution.
    ``rank_col`` optionally exposes the 1-based rank (a stable
    "which k" order for callers that later shrink k without
    resampling).

    DETERMINISM CONTRACT: ``id_col`` must uniquely identify rows.
    Distinct ids cannot tie (60-bit hash), so the selection is a pure
    function of the data; rows SHARING an id share a hash, and which
    physical duplicate survives a k-boundary tie then depends on
    partition order — dedup on the id (or pass a composite id) first.
    NULL ids are excluded (their hash is NULL, like the SQL replay).

    Scale shape (the kmv_sketch two-stage k-min): a partial window over
    (group, hash-salt) first cuts every group — including the global
    no-group case, which is one giant group — to ``partial_buckets``·k
    rows, so the final per-group rank never funnels an unbounded group
    through one partition."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    groups = _groups(group_by)
    h = _sample_hash(F.col(id_col), seed)
    ranked = df.withColumn("__h", h).where(F.col("__h").isNotNull())
    if partial_buckets > 1:
        salt = F.pmod(F.col("__h"), F.lit(partial_buckets))
        w1 = Window.partitionBy(*groups, salt).orderBy("__h")
        ranked = ranked.withColumn("__prk", F.row_number().over(w1)).where(
            F.col("__prk") <= k
        ).drop("__prk")
    w = (
        Window.partitionBy(*[F.col(g) for g in groups]).orderBy("__h")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("__h")
    )
    ranked = ranked.withColumn("__rk", F.row_number().over(w))
    out = ranked.where(F.col("__rk") <= k).drop("__h")
    if rank_col is not None:
        return out.withColumnRenamed("__rk", rank_col)
    return out.drop("__rk")


def epoch_mix(
    df: DataFrame,
    weights: Mapping[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    seed: str = "epochs",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Training-mixture assembly by per-source EPOCH weights — the
    up-sampling half of data mixing that ``stratified_hash_sample``
    (rates <= 1) cannot express: weight 2.5 means every row of that
    source appears twice and half the rows (hash-chosen,
    deterministic) a third time, so the assembled corpus realizes the
    published "epochs per source" recipe exactly (e.g. several epochs
    of a small high-quality source against a fraction of a crawl).

    Output: the input rows, each duplicated per its source's weight,
    with ``epoch_col`` (0-based LongType copy index) appended —
    downstream shuffling/packing treats copies as distinct rows.
    Weight 0 drops the source; fractional parts reuse the 60-bit
    ``kmv_hash`` membership decision, so the selection is a pure
    function of (seed, source, id): partition-independent, resumable,
    and replayable in the SQL oracle (same contract as hash_sample).
    The fractional-epoch row subset is the SAME rows for epoch k and
    any higher threshold would be — i.e. thresholds nest, so raising a
    source's weight only ADDS copies, never reshuffles which rows
    carry the extra epoch.

    Scale shape: one JVM projection — the weight is a CASE literal,
    copies come from exploding a per-row integer sequence (no join, no
    shuffle; output size = sum of weights × source sizes, the
    irreducible cost of materializing the mixture).  For pipelines
    that can consume a (row, multiplicity) pair instead, skip this and
    carry the count — this operator exists for sinks that need the
    rows physically repeated (sequence packing, shard export)."""
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {v}")
    if default_weight < 0:
        raise ValueError(
            f"default_weight must be >= 0, got {default_weight}"
        )
    if epoch_col in df.columns:
        raise ValueError(f"column {epoch_col!r} already exists")
    w = None
    for name, wt in weights.items():
        cond = F.col(source_col) == F.lit(name)
        lit = F.lit(float(wt))
        w = F.when(cond, lit) if w is None else w.when(cond, lit)
    w = F.lit(float(default_weight)) if w is None else w.otherwise(
        F.lit(float(default_weight))
    )
    full = F.floor(w).cast("long")
    frac = w - full.cast("double")
    # seed per source so retuning one source's weight leaves other
    # sources' fractional-copy selections untouched (the
    # stratified_hash_sample contract; same '|' caveat)
    h = _sample_hash(
        F.concat(
            F.col(source_col).cast("string"),
            F.lit("|"),
            F.col(id_col).cast("string"),
        ),
        seed,
    )
    whole = F.when(
        full >= 1, F.sequence(F.lit(0).cast("long"), full - 1)
    ).otherwise(F.array().cast("array<long>"))
    extra = F.when(
        (frac > 0) & (h < (frac * F.lit(float(_DOMAIN))).cast("long")),
        F.array(full),
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn(
        epoch_col, F.explode(F.concat(whole, extra))
    )
