"""Domain/URL-level corpus curation — the per-domain controls every
production LLM corpus pipeline applies (C4 and RefinedWeb both cap and
rebalance by registered domain): host extraction, registered-domain
(eTLD+1) derivation, deterministic per-domain document caps, and a
domain-mix report.

All pure JVM expression work; the cap and the report reuse
``sampling.deterministic_reservoir`` and ``stats.key_skew_report``, so
their scale shapes (salted partial pre-cut / TakeOrderedAndProject) are
inherited rather than re-derived.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common multi-label public suffixes; registered_domain takes the last
# THREE host labels when the last two match one of these.  Not the full
# PSL (no external data in this environment) — pass your own list to
# extend; membership is a literal IN over ≤ a few hundred strings, so
# it stays whole-stage-codegen'd at any corpus size.
DEFAULT_MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.za", "co.nz", "co.id", "co.th",
)


def host_of(url: Column) -> Column:
    """Lowercased host of a URL — Spark's built-in ``try_parse_url``
    (JVM-side, no regex in Python; the ``try_`` form, because ANSI
    mode makes plain ``parse_url`` RAISE on garbage and a corpus-scale
    curation pass must classify bad URLs, not die on the first one).
    NULL when the value has no parseable host."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def registered_domain(
    host: Column,
    multi_suffixes: Sequence[str] = DEFAULT_MULTI_SUFFIXES,
) -> Column:
    """Registered domain (eTLD+1) of a lowercased host: the last two
    labels, or the last three when the final two form a listed
    multi-label public suffix (``www.bbc.co.uk`` → ``bbc.co.uk``).
    Hosts with ≤ 2 labels pass through unchanged; NULL propagates."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n <= 2, host)
        .when(last2.isin(*[str(s) for s in multi_suffixes]), last3)
        .otherwise(last2)
    )


def with_domain(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    domain_col: str = "domain",
    multi_suffixes: Sequence[str] = DEFAULT_MULTI_SUFFIXES,
) -> DataFrame:
    """Attach ``host`` and registered ``domain`` columns — one
    projection, no shuffle."""
    host = host_of(F.col(url_col))
    return df.withColumn(host_col, host).withColumn(
        domain_col, registered_domain(F.col(host_col), multi_suffixes)
    )


def per_domain_cap(
    df: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    seed: str = "domaincap",
    domain_col: str = "domain",
    rank_col: Optional[str] = None,
    multi_suffixes: Sequence[str] = DEFAULT_MULTI_SUFFIXES,
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain — the C4 /
    RefinedWeb anti-boilerplate control — selected DETERMINISTICALLY
    (hash-ranked reservoir on ``id_col``, so the kept set is a pure
    function of the data: partitioning-, ordering-, and cluster-size-
    invariant, and DuckDB-replayable).

    Rows whose URL yields no registered domain (no parseable host) are
    DROPPED — a doc that cannot be attributed to a domain cannot be
    budgeted against one, which is the curation stance of the
    pipelines this mirrors.  Output carries ``domain_col`` (and the
    host) for downstream mix accounting.

    Scale shape: inherited from ``deterministic_reservoir`` — a salted
    partial window first cuts every domain to ~buckets·cap rows, so a
    mega-domain (the exact skew this operator exists to tame) never
    funnels through one task."""
    from jepl_spark.operators.sampling import deterministic_reservoir

    d = with_domain(
        df, url_col, domain_col=domain_col, multi_suffixes=multi_suffixes
    ).where(F.col(domain_col).isNotNull())
    return deterministic_reservoir(
        d, id_col, cap, group_by=domain_col, seed=seed, rank_col=rank_col
    )


# tracking parameters stripped by canonical_url: the ad-click and
# analytics ids that make one page arrive under millions of distinct
# URLs (the reason C4-style pipelines dedup by CANONICAL url).  Bare
# 'ref' is deliberately NOT in the list: many sites use it
# semantically (?ref=main vs ?ref=dev are different pages) and a
# false-positive dedup silently deletes real content — strictly worse
# than a missed dedup.
_TRACKING_PARAM_RE = r"(utm_[a-z0-9_]*|gclid|fbclid|msclkid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for URL-level dedup: lowercased scheme
    and host, ``www.`` prefix dropped, default ports stripped,
    fragment dropped, tracking query parameters removed
    (utm_*/gclid/fbclid/msclkid — other parameters, including the
    semantically-loaded bare ``ref``, keep their order), empty ``?``
    cleaned up, trailing slashes trimmed.

    Pure regexp_replace chain in the Java∩RE2 dialect — no lookaheads,
    no backrefs-in-pattern (same contract as the PII scrubber) — so
    the DuckDB oracle replays it verbatim, and all JVM-side, no
    Python.  Absolute http(s) URLs are the domain of the spec; other
    strings pass through the later steps unchanged.  NULL propagates.
    """
    # lowercase scheme + authority only (the path keeps its case)
    head = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    )
    tail = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(head, tail)  # no-match => head='' and tail=url
    # drop www. right after the (now lowercased) scheme
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")
    # default ports (delimiter captured, not looked-ahead: RE2-safe)
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443($|[/?#])", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80($|[/?#])", r"$1$2")
    u = F.regexp_replace(u, r"#.*$", "")                    # fragment
    # tracking params: the match consumes "<delim>tracker[&]" and
    # re-emits ONLY the leading delimiter — the consumed trailing '&'
    # becomes the next parameter's separator, so no '&&' residue can
    # form and nothing outside the match is touched (a literal '&&'
    # in a PATH must survive: collapsing it would merge distinct
    # URLs — a false-positive dedup).  Each pass consumes the
    # delimiter of an adjacent tracker, so three passes cover any
    # realistic run (tested to 4 adjacent).
    for _ in range(3):
        u = F.regexp_replace(u, r"([?&])" + _TRACKING_PARAM_RE + r"(&|$)",
                             r"$1")
    u = F.regexp_replace(u, r"[?&]+$", "")                  # dangling ? / &
    u = F.regexp_replace(u, r"\?&+", "?")                   # ?&x -> ?x
    u = F.regexp_replace(u, r"/+$", "")                     # trailing slash
    return u


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    keep_canonical_col: str | None = None,
) -> DataFrame:
    """URL-level dedup: keep ONE row (the minimum id) per canonical
    URL — the first dedup pass a crawl corpus runs (cheaper than any
    content hash: the same page fetched under utm-tagged / fragment /
    www-variant URLs collapses before its text is ever touched).  Rows
    whose URL is NULL are kept (no URL evidence — content-level dedup
    downstream still sees them).  One shuffle on the canonical string;
    ``keep_canonical_col`` exposes the canonical form in the output."""
    canon = canonical_url(F.col(url_col))
    tagged = df.withColumn("__canon", canon)
    # distinct column names on the winner side: a same-name condition
    # over a self-join lineage risks Spark resolving both sides to one
    # attribute (it warns "trivially true equals predicate")
    winners = (
        tagged.where(F.col("__canon").isNotNull())
        .groupBy(F.col("__canon").alias("__wc"))
        .agg(F.min(F.col(id_col)).alias("__keep"))
    )
    out = tagged.join(
        winners,
        (F.col("__canon") == F.col("__wc"))
        & (F.col(id_col) == F.col("__keep")),
        "left_semi",
    ).unionByName(tagged.where(F.col("__canon").isNull()))
    if keep_canonical_col is not None:
        return out.withColumnRenamed("__canon", keep_canonical_col)
    return out.drop("__canon")


def stream_url_dedup(
    stream: DataFrame,
    url_col: str = "url",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    keep_canonical_col: str | None = None,
) -> DataFrame:
    """STREAMING URL-level dedup at ingest: the first arrival of each
    canonical URL passes, later utm-tagged / fragment / www-variant
    fetches of the same page drop BEFORE their content is ever decoded
    — the streaming twin of ``url_dedup``, and the cheapest first-pass
    filter an ingest pipeline can run (composition of two gated
    pieces: ``canonical_url`` + ``dropDuplicatesWithinWatermark``,
    mirroring ``dedup.stream_exact_dedup``).

    Rows whose URL has no canonical form (NULL url or NULL canonical)
    are passed through UNCHANGED and hold no dedup state — no URL
    evidence, so content-level dedup downstream still sees them; this
    matches the batch operator.  The two branches are a streaming
    union of the same source, so the query stays one stream.

    With ``ts_col``: state for a canonical is evicted once the
    event-time watermark passes its timestamp + delay — state is
    bounded by rate × delay (the only shape that survives an unbounded
    crawl); a re-fetch arriving after eviction is re-admitted, which
    is the documented contract of watermark-bounded dedup.  Without
    ``ts_col``: exact-forever dedup, state grows with distinct URLs —
    bounded backfills only.

    Scale shape: canonicalization is a fixed regexp chain (pure JVM
    projection, no Python); the dedup state key is the canonical
    string only — rows are emitted immediately, state filters rather
    than holds, so it composes in front of windowed aggregation / the
    exactly-once sink without adding latency."""
    canon_name = keep_canonical_col or "__canon"
    tagged = stream.withColumn(canon_name, canonical_url(F.col(url_col)))
    with_url = tagged.where(F.col(canon_name).isNotNull())
    no_url = tagged.where(F.col(canon_name).isNull())
    if ts_col is None:
        deduped = with_url.dropDuplicates([canon_name])
    else:
        deduped = with_url.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark([canon_name])
    out = deduped.unionByName(no_url)
    if keep_canonical_col is not None:
        return out
    return out.drop("__canon")


def stream_domain_cap(
    stream: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    seed: str = "domaincap",
    domain_col: str = "domain",
    multi_suffixes: Sequence[str] = DEFAULT_MULTI_SUFFIXES,
) -> DataFrame:
    """STREAMING per-domain admission cap: every registered domain has
    a lifetime budget of ``cap`` documents; arrivals beyond it drop at
    ingest.  Emits admitted rows ``(domain, id, admitted_rank)`` with
    rank 1..cap in admission order.

    Semantics (deterministic, gate-replayable): within a micro-batch,
    each domain's candidates are ranked by the SAME (hash, id) order
    as the batch reservoir (``deterministic_reservoir``), and the
    domain's remaining budget admits the best-ranked — so a
    single-batch run reproduces ``per_domain_cap`` exactly (how the
    correctness gate replays it in SQL), and any run's admitted set is
    a pure function of the micro-batch partition sequence.  Across
    batches, earlier arrivals consume budget first — the streaming-
    native reading of a lifetime cap.  Rows without a parseable
    registered domain drop (cannot be budgeted; matches the batch op).

    Scale shape: the JVM side computes host/domain/hash (pure
    expressions) so Python receives (domain, id, hash) longs/strings
    only — never text or URLs at full width; state is ONE long per
    distinct domain under ``applyInPandasWithState`` with NoTimeout (a
    lifetime budget never expires).  State cardinality = distinct
    domains (~10^7 for a web corpus — small next to the content);
    per-batch work shuffles only the batch's (domain, id, hash) rows."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from jepl_spark.operators.sampling import _sample_hash

    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    prepared = (
        with_domain(
            stream, url_col, domain_col=domain_col,
            multi_suffixes=multi_suffixes,
        )
        .where(F.col(domain_col).isNotNull())
        .select(
            F.col(domain_col).alias("domain"),
            # the id keeps ITS OWN type (string ids must not silently
            # cast to NULL longs) — the output schema mirrors the input
            F.col(id_col).alias("id"),
            _sample_hash(F.col(id_col).cast("string"), seed).alias("__h"),
        )
        .where(F.col("__h").isNotNull())
    )
    id_type = prepared.schema["id"].dataType
    out_schema = StructType([
        StructField("domain", StringType()),
        StructField("id", id_type),
        StructField("admitted_rank", LongType()),
    ])
    state_schema = StructType([StructField("used", LongType())])

    def update(key, pdfs, state: GroupState):
        domain = key[0]
        used = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["__h", "id"], kind="mergesort")
        room = cap - used
        if room <= 0:
            return
        take = batch.iloc[:room]
        n = len(take)
        state.update((used + n,))
        yield pd.DataFrame({
            "domain": [domain] * n,
            "id": take["id"].to_numpy(),
            "admitted_rank": used + 1 + pd.RangeIndex(n).to_numpy(),
        })

    return prepared.groupBy("domain").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def domain_mix_report(
    df: DataFrame,
    url_col: str,
    top: int = 20,
    domain_col: str = "domain",
    multi_suffixes: Sequence[str] = DEFAULT_MULTI_SUFFIXES,
) -> DataFrame:
    """The ``top`` heaviest registered domains with counts and corpus
    share — the skew/mix diagnostic read before setting per-domain
    caps.  Reuses ``key_skew_report`` (TakeOrderedAndProject — no full
    sort, no unbounded window).  Unattributable rows (NULL domain) are
    excluded entirely — shares are of the attributable corpus."""
    from jepl_spark.operators.stats import key_skew_report

    d = with_domain(
        df, url_col, domain_col=domain_col, multi_suffixes=multi_suffixes
    )
    return key_skew_report(d, domain_col, top=top)


# HTML→text extraction: the FIRST stage of every web corpus (C4 /
# RefinedWeb start from crawled markup, not text).  One frozen spec —
# an ordered list of (Java∩RE2 pattern, Java-style replacement) — that
# BOTH the Spark column (html_to_text) and the DuckDB oracle twin
# (html_to_text_sql) fold over, so the two engines execute the
# identical chain: no lookaheads, no backrefs-in-pattern, inline (?is)
# flags only (the same dialect contract as scrub_pii / canonical_url).
#
# Order is load-bearing:
#   1. comments, then script/style/head BLOCKS (closed form first,
#      then unclosed-to-EOF — a crawl-truncated <script> must not leak
#      JavaScript into the corpus as "text");
#   2. CDATA markers stripped, content kept;
#   3. block-level tags become NEWLINES (so line structure survives
#      for strip_boilerplate_lines), every other tag a space;
#   4. entities decode AFTER tag removal (a decoded '<' must not look
#      like a tag) with &amp; LAST (single-pass: '&amp;lt;' must yield
#      the literal text '&lt;', not '<');
#   5. whitespace normalizes, newline structure preserved.
#
# Known approximation (shared with every regex-level extractor): a '>'
# inside a quoted attribute value ends the tag early; and a </script>
# inside a JS string literal ends the script block early — the latter
# matching browser tokenizer behavior.
HTML_TO_TEXT_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<!--.*?-->", " "),              # comments (closed)
    (r"(?is)<!--.*", " "),                  # unclosed comment: to EOF
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<script\b[^>]*>.*", " "),       # unclosed script: to EOF
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<style\b[^>]*>.*", " "),        # unclosed style: to EOF
    (r"(?is)<head\b[^>]*>.*?</head\s*>", " "),
    (r"(?is)<!\[CDATA\[(.*?)\]\]>", "$1"),  # markers off, content kept
    (r"(?i)<(br|hr)\b[^>]*>", "\n"),
    (
        r"(?i)</?(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|"
        r"article|header|footer|pre|title|td|th|dt|dd)(\s[^>]*)?/?\s*>",
        "\n",
    ),
    (r"(?is)</?[a-z][^>]*>", " "),          # any remaining tag
    (r"(?is)<[!?][^>]*>", " "),             # doctype / PI / stray <!…>
    (r"&nbsp;|&#160;", " "),
    (r"&lt;|&#60;", "<"),
    (r"&gt;|&#62;", ">"),
    (r"&quot;|&#34;", "\""),
    (r"&apos;|&#39;", "'"),
    (r"&amp;|&#38;", "&"),                  # LAST (single-pass decode)
    (r"[ \t\r\f\x0B]+", " "),               # spaces collapse, \n kept
    (r"[ ]*\n[ ]*", "\n"),                  # trim line edges
    (r"\n+", "\n"),                         # collapse blank lines
    (r"^\s+|\s+$", ""),                     # trim document edges
)


def html_to_text(html: Column) -> Column:
    """Extracted text of an HTML document — tag/script/style/comment
    removal, common-entity decoding, whitespace normalization — as a
    pure JVM regexp_replace chain over ``HTML_TO_TEXT_STEPS`` (see the
    spec above for ordering and the documented approximations).  Block
    tags become newlines so the output feeds ``strip_boilerplate_lines``
    / ``repetition_features`` with real line structure; NULL
    propagates; plain text without markup passes through unchanged
    (modulo whitespace normalization).

    Scale: one projection, no shuffle, whole-stage-codegen'd; the
    chain is fixed-size so plan cost is constant in corpus size."""
    out = html
    for pat, rep in HTML_TO_TEXT_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of ``html_to_text``: the SAME step list folded into
    nested ``regexp_replace(…, 'g')`` calls — group refs converted
    from Java ``$1`` to RE2 ``\\1``, literal newlines embedded directly
    in the SQL string literal.  Exists so correctness gates replay the
    chain verbatim instead of hand-mirroring it (one spec, two
    engines)."""
    sql = expr
    for pat, rep in HTML_TO_TEXT_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("$", "\\").replace("'", "''")
        sql = f"regexp_replace({sql}, '{p}', '{r}', 'gs')"
    return sql


def extract_html(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """Attach ``text_col`` = extracted text of ``html_col`` — the
    pipeline-stage wrapper over ``html_to_text`` (wired ahead of
    boilerplate/dedup by jobs.corpus_pipeline --html)."""
    return df.withColumn(text_col, html_to_text(F.col(html_col)))
