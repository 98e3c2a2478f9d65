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


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed
    text — equal fingerprints ⇔ same normalized content.  Shares
    dedup.content_hash so the fingerprint/exact-dedup equivalence the
    gate oracles assume cannot drift."""
    from .dedup import content_hash

    return content_hash(text)


# Minimal per-language stopword lists for n-gram-free heuristic language
# ID.  Deliberately tiny and deterministic; zh detection is CJK-ratio.
_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "por"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"],
}


def lang_id(text: Column) -> Column:
    """Heuristic language ID: CJK-character ratio → 'zh'; otherwise the
    language whose stopword list overlaps the token set most; ties and
    zero overlap → 'und' (undetermined)."""
    toks = _tokens(F.lower(text))
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    n_chars = F.length(text)

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
    return F.when(
        (n_chars > 0) & ((cjk / F.when(n_chars == 0, 1).otherwise(n_chars)) > 0.2),
        F.lit("zh"),
    ).otherwise(guess)
