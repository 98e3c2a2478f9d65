"""Text-analysis operators for training-data pipelines.

All pure ``pyspark.sql.functions`` / SQL lambda expressions — JVM-side,
whole-stage-codegen'd, no Python UDFs — so they scale linearly with
input splits and add no shuffle (all are per-row projections).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace tokenization shared by several operators
def _tokens(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.size(_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-like proxy token count: word pieces + punctuation marks,
    approximating subword tokenizers with length/4 for long words."""
    words = _tokens(text)
    pieces = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc
        + F.when(F.length(w) <= 4, F.lit(1)).otherwise(
            (F.length(w) + 3) / 4
        ).cast("int"),
    )
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return (pieces + punct).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic per-document quality scores: length, token stats,
    punctuation/digit/uppercase ratios, mean token length."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    safe_len = F.when(n_chars == 0, F.lit(1)).otherwise(n_chars)
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        F.size(toks).alias("q_n_tokens"),
        (F.length(F.regexp_replace(text, r"[^.,;:!?]", "")) / safe_len)
        .alias("q_punct_ratio"),
        (F.length(F.regexp_replace(text, r"[^0-9]", "")) / safe_len)
        .alias("q_digit_ratio"),
        (F.length(F.regexp_replace(text, r"[^A-Z]", "")) / safe_len)
        .alias("q_upper_ratio"),
        F.when(F.size(toks) == 0, F.lit(0.0))
        .otherwise(
            F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)).cast("double")
            / F.size(toks)
        )
        .alias("q_mean_token_len"),
    )


def winnow_fingerprints(text: Column, k: int = 8, window: int = 4) -> Column:
    """MOSS-style winnowing fingerprints (the brief's rolling-hash
    document fingerprinting): hash every k-char gram of the normalized
    text with a base-31 rolling polynomial over codepoints, slide a
    window of ``window`` consecutive gram hashes, keep each window's
    minimum, return the sorted distinct selection as ``array<long>``.

    The winnowing guarantee: any substring shared between two documents
    of length ≥ window + k − 1 contributes at least one COMMON
    fingerprint — the property that makes this the standard
    partial-overlap/containment detector (quotation and boilerplate
    reuse that whole-document MinHash misses).

    Implementation notes:
    - the gram hash is Horner's rule over codepoints built by chained
      ``zip_with`` over shifted copies of the code array (the
      word_shingle_hashes shape: one evaluation per shift, never the
      index-sequence form that re-evaluates the array per element);
    - the window minimum is the same chained-``zip_with`` trick with
      ``least`` — no per-position slice+array_min (which would
      re-evaluate the gram array per window position);
    - k ≤ 8 is enforced: max codepoint (0x10FFFF) times Σ31^j for
      j<8 stays under 2^63, so the UNREDUCED polynomial cannot
      overflow a Java long under ANSI mode (and the identical integer
      arithmetic is replayable in an SQL oracle — no modulus games);
    - texts shorter than k yield ONE fingerprint (Horner over the whole
      text); texts with fewer grams than the window also yield one
      (the minimum of all grams — `least` with zip_with's null padding
      does this naturally); empty/whitespace-only text yields an empty
      array.  The SQL oracle twin replays all three boundaries.

    Normalization matches content_hash (lower + collapse whitespace),
    so fingerprint equality composes with the dedup operators'."""
    if not (1 <= k <= 8):
        raise ValueError(
            f"k must be in [1, 8]: codepoint·Σ31^j stays under 2^63 only "
            f"for k ≤ 8 (got {k}); larger grams need a modulus, which "
            f"would break exact SQL-oracle replay"
        )
    if window < 1:
        raise ValueError(f"window must be ≥ 1 (got {window})")
    s = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long"))
    n = F.size(codes)

    def shifted(arr: Column, t: int) -> Column:
        return F.slice(arr, t + 1, F.greatest(F.size(arr) - t, F.lit(0)))

    gram = codes
    for j in range(1, k):
        gram = F.zip_with(gram, shifted(codes, j), lambda p, c: p * 31 + c)
    grams = F.slice(gram, 1, F.greatest(n - (k - 1), F.lit(0)))

    m = grams
    for t in range(1, window):
        m = F.zip_with(m, shifted(grams, t), lambda a, b: F.least(a, b))
    selected = F.slice(m, 1, F.greatest(F.size(grams) - (window - 1), F.lit(1)))

    whole = F.array(F.aggregate(codes, F.lit(0).cast("long"),
                                lambda acc, c: acc * 31 + c))
    return (
        F.when(F.length(s) == 0, F.array().cast("array<long>"))
        .when(n < k, whole)
        .otherwise(F.array_sort(F.array_distinct(selected)))
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 1000,
    materialize: bool = True,
) -> DataFrame:
    """Partial-overlap candidate pairs by shared winnowing fingerprints
    — containment/quotation detection (a doc embedding a ≥(window+k−1)-
    char chunk of another shares ≥1 fingerprint by the winnowing
    guarantee; ``min_shared`` filters incidental single collisions).

    Scale shape: the ngram_jaccard_pairs inverted-index pattern —
    (id, fingerprint) explodes, hot fingerprints (boilerplate) are
    df-capped, the self-join carries ids+longs only."""
    from .dedup import banded_candidate_pairs  # noqa: F401  (pattern ref)

    base = df.select(
        F.col(id_col).alias("__id"),
        F.explode(winnow_fingerprints(F.col(text_col), k, window)).alias("__fp"),
    )
    if materialize:
        base = base.persist()
    fp_df = base.groupBy("__fp").agg(F.count(F.lit(1)).alias("__df"))
    pruned = base.join(
        fp_df.filter(F.col("__df") <= max_fp_df), on="__fp", how="inner"
    )
    a = pruned.select("__fp", F.col("__id").alias("id_a"))
    b = pruned.select("__fp", F.col("__id").alias("id_b"))
    out = (
        a.join(b, on="__fp", how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        base.unpersist()
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed
    text — equal fingerprints ⇔ same normalized content.  Shares
    dedup.content_hash so the fingerprint/exact-dedup equivalence the
    gate oracles assume cannot drift."""
    from .dedup import content_hash

    return content_hash(text)


# Language-ID spec (script ranges + stopword lists) loaded from the
# checked-in fixture.  The DuckDB oracle twin in __spark_entry__.py
# reads the SAME file, so the two sides cannot drift (a generator-code
# bug would otherwise shift both sides identically — VERDICT r2 item 3).
def _load_lang_spec() -> dict:
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "lang_id.json",
    )
    with open(path, encoding="utf-8") as f:
        spec = json.load(f)
    # fail fast on a malformed fixture rather than misclassifying —
    # real raises, not asserts (python -O compiles asserts out)
    if len(spec["stopwords"]) < 8 or len(spec["scripts"]) < 8:
        raise ValueError(f"lang_id fixture {path} is malformed: too few entries")
    for lang, lo, hi, thr in spec["scripts"]:
        if not (len(lo) == 1 and len(hi) == 1 and ord(lo) < ord(hi) and 0 < thr < 1):
            raise ValueError(
                f"lang_id fixture {path}: bad script row {[lang, lo, hi, thr]}"
            )
    return spec


_LANG_SPEC = _load_lang_spec()
_STOPWORDS = _LANG_SPEC["stopwords"]
_SCRIPTS = [tuple(s) for s in _LANG_SPEC["scripts"]]


def lang_id(text: Column) -> Column:
    """Heuristic language ID, spec-driven (fixtures/lang_id.json):

    1. script-ratio checks in fixture order — Japanese kana first (kana
       is uniquely Japanese while kanji is shared, so its threshold is
       lower), then Hangul/CJK/Cyrillic/Arabic/Greek/Devanagari/Hebrew;
    2. otherwise the Latin-script language whose stopword list overlaps
       the distinct-token set strictly most (8 languages);
    3. ties and zero overlap → 'und' (undetermined).

    Pure JVM expressions (regexp counts + array_intersect) — per-row
    projection, no shuffle, scales linearly with input splits."""
    toks = _tokens(F.lower(text))
    n_chars = F.length(text)
    safe_len = F.when(n_chars == 0, F.lit(1)).otherwise(n_chars)

    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in _STOPWORDS.items()
    }
    best = None
    for lang in _STOPWORDS:
        cond = F.lit(True)
        for other in _STOPWORDS:
            if other != lang:
                cond = cond & (scores[lang] > scores[other])
        branch = F.when(cond & (scores[lang] > 0), F.lit(lang))
        best = branch if best is None else best.when(
            cond & (scores[lang] > 0), F.lit(lang)
        )
    guess = best.otherwise(F.lit("und"))

    # script checks take precedence, applied in fixture order (build the
    # WHEN-chain back to front so the FIRST listed script wins)
    for lang, lo, hi, thr in reversed(_SCRIPTS):
        ratio = F.length(F.regexp_replace(text, f"[^{lo}-{hi}]", "")) / safe_len
        guess = F.when((n_chars > 0) & (ratio > thr), F.lit(lang)).otherwise(guess)
    return guess
