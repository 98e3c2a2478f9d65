"""Distributed Bloom filter for map-side semi-join pruning.

The 100 TB shape this exists for: a big fact table must be semi-joined
against a selective dimension subset.  A real join shuffles the fact
table on the key; a Bloom filter built from the dimension side prunes
the fact table IN THE SCAN STAGE — no fact-side shuffle at all — at the
cost of a tunable false-positive rate (Bloom 1970, "Space/time
trade-offs in hash coding with allowable errors"; the same idea behind
Spark's own runtime-filter InjectRuntimeFilter, here as an explicit,
engine-replayable operator the pipeline can persist and reuse).

Layout: 63-bit words (bit 63 never set, so words survive signed-long
engines and replay in DuckDB's BIGINT `<<` without overflow), stored as
rows (word_idx, word).  Building is one exchange of at most
⌈n_bits/63⌉ rows — map-side partial ``bit_or`` collapses the k-hash
explode before the shuffle.  The dense word array (``n_bits/8`` bytes,
e.g. 128 KiB for 2^20 bits) is then embedded as an array literal in the
membership predicate: the fact-side test is a pure projection —
whole-stage-codegen'd, no shuffle, no join, pushdown-compatible with
everything around it.  ``collect_words`` is the broadcast step, bounded
by ``n_bits`` and independent of data volume.

Hashes: ``hasher="md5"`` (default) uses the deterministic md5-derived
60-bit hash shared with the KMV/CMS sketches — exactly replayable in
the SQL oracle.  ``hasher="xxhash64"`` is the cheaper production choice
(JVM xxhash64(col, seed=j)) when cross-engine replay is not required.
"""

from __future__ import annotations

import math
from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jepl_spark.operators.sketch import kmv_hash

WORD_BITS = 63


def _bucket(col: Column, j: int, n_bits: int, hasher: str) -> Column:
    """NULL-propagating: a NULL key gets NULL buckets, so it can never
    pass ``might_contain`` (SQL semi-join semantics: NULL ∉ anything)
    and never sets bits at build — matching the DuckDB oracle replay."""
    if hasher == "md5":
        h = kmv_hash(F.concat(F.lit(f"{j}:"), col.cast("string")))
    elif hasher == "xxhash64":
        h = F.when(
            col.isNotNull(), F.xxhash64(col.cast("string"), F.lit(j))
        )
    else:
        raise ValueError(f"hasher must be 'md5' or 'xxhash64', got {hasher!r}")
    return F.pmod(h, F.lit(n_bits))


def _check_shape(n_bits: int, k: int) -> None:
    if n_bits < WORD_BITS:
        raise ValueError(f"n_bits must be >= {WORD_BITS}, got {n_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def bloom_build(
    df: DataFrame,
    col: str,
    n_bits: int = 1 << 16,
    k: int = 3,
    hasher: str = "md5",
) -> DataFrame:
    """Build the filter from the (small) key side: rows
    (word_idx, word) with word = OR of 1<<(bucket mod 63) over every
    key hash landing in that word.  Sparse rows — absent word_idx means
    an all-zero word.  NULL keys are excluded (semi-join semantics)."""
    _check_shape(n_bits, k)
    buckets = df.where(F.col(col).isNotNull()).select(
        F.explode(
            F.array(
                *[_bucket(F.col(col), j, n_bits, hasher) for j in range(k)]
            )
        ).alias("b")
    )
    return (
        buckets.select(
            F.floor(F.col("b") / WORD_BITS).cast("long").alias("word_idx"),
            _shift_one(F.col("b") % WORD_BITS).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def collect_words(filter_df: DataFrame, n_bits: int) -> List[int]:
    """Densify the sparse word rows into a python list — the broadcast
    step.  Size is ⌈n_bits/63⌉ longs, a function of the FILTER's
    configuration only, never of the data: this is the one place a
    driver-side collect is the correct distribution mechanism (it is
    what Spark's own broadcast of a runtime bloom filter does)."""
    n_words = (n_bits + WORD_BITS - 1) // WORD_BITS
    words = [0] * n_words
    for r in filter_df.select("word_idx", "word").collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def might_contain(
    col: Column,
    words: List[int],
    n_bits: int,
    k: int = 3,
    hasher: str = "md5",
) -> Column:
    """Membership predicate as a pure projection over an embedded word
    array — all k probed bits set.  False positives possible (rate
    ≈ (1-e^{-kn/m})^k), false negatives impossible.  NULL keys are
    False (SQL semi-join semantics: NULL matches nothing).

    Column-expression form: the words ride as one flat ArrayType
    Literal (NOT F.array(*1000s of children)).  Past ~2048 words the
    literal still degrades codegen — ``bloom_prune`` switches to a
    broadcast binding automatically; use it for large filters."""
    _check_shape(n_bits, k)
    arr = F.lit([int(w) for w in words]).cast("array<bigint>")
    return _might_contain_on(arr, col, n_bits, k, hasher)


def _shift_one(bit_col: Column) -> Column:
    """1L << bit for a COLUMN shift amount (the python F.shiftleft
    wrapper only takes int shifts; the SQL function takes any
    expression — call_function routes Columns through)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), bit_col.cast("int")
    )


# above this many 63-bit words (~2^17 bits, 16 KiB) the inline array
# Literal blows past codegen's method-size limit and Spark falls back
# to interpreted per-row evaluation (~30x slower, measured 10 s vs
# 0.6 s on 200k rows at 2^20 bits) — bind big filters as a broadcast
# single-row column instead, which stays compiled
_LITERAL_WORDS_MAX = 2048


def _might_contain_on(word_arr: Column, col: Column, n_bits: int,
                      k: int, hasher: str) -> Column:
    pred = None
    for j in range(k):
        b = _bucket(col, j, n_bits, hasher)
        word = F.element_at(word_arr, F.floor(b / WORD_BITS).cast("int") + 1)
        pred_j = word.bitwiseAND(_shift_one(b % WORD_BITS)) != 0
        pred = pred_j if pred is None else (pred & pred_j)
    return F.coalesce(pred, F.lit(False))


def bind_word_array(df: DataFrame, words: List[int]):
    """Bind a Bloom word array to ``df`` in whichever form keeps the
    membership predicate inside compiled code: small arrays as ONE
    flat Literal, arrays past ``_LITERAL_WORDS_MAX`` as a broadcast
    single-row cross join (stateless — works on streams too).  Returns
    ``(frame, word_array_column, drop_col_or_None)``; the caller drops
    ``drop_col`` after filtering.  Shared by ``bloom_prune`` and
    ``dedup.stream_decontaminate`` so the binding rules cannot
    diverge."""
    if len(words) <= _LITERAL_WORDS_MAX:
        return df, F.lit([int(w) for w in words]).cast("array<bigint>"), None
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    wc = "__bloom_words"
    while wc in df.columns:  # never clobber or shadow a caller column
        wc += "_"
    arr_df = df.sparkSession.createDataFrame(
        [([int(w) for w in words],)],
        StructType([StructField(wc, ArrayType(LongType()), False)]),
    )
    return df.crossJoin(F.broadcast(arr_df)), F.col(wc), wc


def bloom_prune(
    df: DataFrame,
    col: str,
    words: List[int],
    n_bits: int,
    k: int = 3,
    hasher: str = "md5",
) -> DataFrame:
    """Filter ``df`` to rows whose key might be in the filter — the
    map-side semi-join prune.  Small filters are embedded as a literal
    (pure projection); large ones ride a broadcast single-row join so
    the predicate stays inside compiled code (see _LITERAL_WORDS_MAX)."""
    _check_shape(n_bits, k)
    frame, arr, drop = bind_word_array(df, words)
    pred = _might_contain_on(arr, F.col(col), n_bits, k, hasher)
    out = frame.where(pred)
    return out.drop(drop) if drop else out


def expected_fpr(n_items: int, n_bits: int, k: int) -> float:
    """Classic FPR estimate (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-k * n_items / n_bits)) ** k
