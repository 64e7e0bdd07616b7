"""Text-analysis functions for training-data pipelines.

All of these are pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen friendly, no Python in the hot path. Each
has an exact ANSI-SQL twin (see plans/analytics.py oracles) so results
are oracle-checkable. The reference has no text surface at all; these
are the BASELINE.json north-star extensions.

Semantics are deliberately simple and deterministic:
- words        = regexp split of trim(text) on ``\\s+``
- tokens       = BPE-ish lexer count: matches of ``\\w+|[^\\w\\s]``
- stopwords    = occurrences of STOPWORDS among words
- punct        = matches of ``[^\\w\\s]``
- fingerprint  = md5 of lower(text) with whitespace collapsed to one
                 space (document fingerprinting via stable hash)
- quality      = coverage * (1 - stopword_ratio) * word-length sanity,
                 a transparent heuristic in the C4/Gopher-rules spirit
- language     = argmax of per-language marker-word hits, ties broken
                 by a fixed language priority, 'und' when no marker hits
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "it", "as",
)

# marker words per language for the n-gram/stopword language heuristic;
# ties resolve in this dict's order (en first)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "you", "that", "it", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ich", "mit", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "pas", "vous", "une", "que", "dans"),
    "es": ("el", "la", "los", "las", "es", "una", "que", "por", "con", "para"),
    "pt": ("o", "os", "uma", "que", "com", "para", "nao", "em", "um", "da"),
}


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def _count_in(words: Column, vocab: tuple[str, ...]) -> Column:
    """Occurrences of any vocab word (JVM-side array filter)."""
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w))).cast("long")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add deterministic quality/statistics columns. Oracle-twin SQL in
    plans/analytics.py (q_text_stats)."""
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words).cast("long")
    n_chars = F.length(text).cast("long")
    stop_hits = _count_in(words, STOPWORDS)
    stop_ratio = F.round(stop_hits / n_words, 4)
    avg_word_len = F.round(
        F.length(F.regexp_replace(text, r"\s", "")) / n_words, 4
    )
    return (
        df.withColumn("n_chars_c", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("avg_word_len", avg_word_len)
        .withColumn(
            "token_count", F.regexp_count(text, F.lit(r"\w+|[^\w\s]")).cast("long")
        )
        .withColumn(
            "punct_ratio",
            F.round(F.regexp_count(text, F.lit(r"[^\w\s]")) / n_chars, 4),
        )
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn(
            "quality_score",
            F.round(
                (F.least(n_words, F.lit(100)) / 100.0)
                * (1.0 - stop_ratio)
                * F.when((avg_word_len >= 3.0) & (avg_word_len <= 10.0), 1.0).otherwise(0.5),
                4,
            ),
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable document fingerprint: md5 over normalized text."""
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(F.trim(normalized)))


# ------------------------------------------------------- PII redaction

#: RE2-compatible (and java.util.regex-compatible) patterns — no
#: lookarounds, so Spark and the DuckDB oracle compile them identically
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"


def with_pii_redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact the three bread-and-butter PII classes every
    published curation pipeline scrubs (C4, Dolma, RefinedWeb): email
    addresses, IPv4 addresses, phone numbers. Adds

    - ``n_emails`` / ``n_ips`` / ``n_phones`` — PROGRESSIVE match
      counts: each class is counted on the text with the earlier
      classes already redacted, so the three counts sum exactly to
      the placeholders emitted (the audit-trail invariant; a phone
      number embedded in an email's local part counts as part of the
      email, not twice), and
    - ``redacted`` — the text with matches replaced by ``[EMAIL]`` /
      ``[IP]`` / ``[PHONE]`` placeholders.

    Redaction order: emails first (their host part would otherwise be
    half-eaten by the IP pattern), then IPs, then phones. All six
    expressions are JVM regex ops over one pass of the row — zero
    shuffle, codegen'd, embarrassingly parallel at any corpus size.
    The regexes are the deterministic heuristic tier (like
    ``with_language``): no lookarounds or Unicode classes, so the
    DuckDB (RE2) oracle and Spark (java.util.regex) agree match for
    match."""
    text = F.col(text_col)
    after_email = F.regexp_replace(text, PII_EMAIL, "[EMAIL]")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "[IP]")
    redacted = F.regexp_replace(after_ip, PII_PHONE, "[PHONE]")
    return (
        df.withColumn(
            "n_emails", F.regexp_count(text, F.lit(PII_EMAIL)).cast("long")
        )
        .withColumn(
            "n_ips", F.regexp_count(after_email, F.lit(PII_IPV4)).cast("long")
        )
        .withColumn(
            "n_phones", F.regexp_count(after_ip, F.lit(PII_PHONE)).cast("long")
        )
        .withColumn("redacted", redacted)
    )


def with_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID; 'und' when nothing matches. A real
    lang-id model is out of scope for the container — this is the
    deterministic heuristic tier, structured so the scoring is one
    JVM-side pass over the word array."""
    words = _words(F.lower(F.col(text_col)))
    scores = {lang: _count_in(words, markers) for lang, markers in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    # argmax, earlier langs winning ties: lang wins when score > 0,
    # strictly beats every earlier lang, and >= every later lang
    result = F.lit("und")
    for idx, lang in enumerate(langs):
        cond = scores[lang] > 0
        for jdx, other in enumerate(langs):
            if jdx < idx:
                cond = cond & (scores[lang] > scores[other])
            elif jdx > idx:
                cond = cond & (scores[lang] >= scores[other])
        result = F.when(cond, F.lit(lang)).otherwise(result)
    return df.withColumn("lang_pred", result)


# ------------------------------------------------ winnowing fingerprints

WINNOW_K = 5  # char-gram length
WINNOW_W = 4  # winnowing window (hashes per window)


def _with_winnow_fps(
    df: DataFrame, text_col: str, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Adds ``fps``: the winnowing fingerprint set (Schleimer et al.,
    MOSS): rolling char k-grams over whitespace-normalized lowercase
    text -> md5 -> min hash per window of w consecutive grams ->
    distinct. The min-per-window rule guarantees any shared substring
    of length >= k+w-1 contributes a shared fingerprint, so PARTIAL
    overlaps surface without comparing full texts (md5 hex compares
    lexicographically the same in every engine). All JVM-side:
    transform / slice / array_min; no Python per row."""
    return (
        df.withColumn(
            "_norm",
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")),
        )
        .withColumn(
            "_hs",
            F.expr(
                f"CASE WHEN length(_norm) >= {k} THEN "
                f"transform(sequence(1, length(_norm) - {k - 1}), "
                f"i -> md5(substr(_norm, i, {k}))) "
                f"ELSE cast(array() AS array<string>) END"
            ),
        )
        .withColumn(
            "fps",
            F.expr(
                f"CASE WHEN size(_hs) >= {w} THEN "
                f"array_distinct(transform(sequence(1, size(_hs) - {w - 1}), "
                f"j -> array_min(slice(_hs, j, {w})))) "
                f"ELSE cast(array() AS array<string>) END"
            ),
        )
        .drop("_norm", "_hs")
    )


def with_winnow_summary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Per-document fingerprint summary (count + lexicographic min) —
    the oracle-checkable face of the winnowing pipeline."""
    from lynx_spark.operators._util import ensure_parallelism

    # r14: same input-parallelism fix as _exploded_fps — the per-char
    # md5 pass must not serialize on one scan partition (guide §2.5)
    df = ensure_parallelism(df)
    return _with_winnow_fps(df, text_col, k, w).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size("fps").cast("long").alias("n_fp"),
        F.array_min("fps").alias("min_fp"),
    )


def _exploded_fps(
    df: DataFrame, id_col: str, text_col: str, k: int, w: int, out_id: str
) -> DataFrame:
    """(id, fp) rows from the winnowing fingerprint arrays, with the
    array frame PERSISTED (eagerly) before the explode. The barrier is
    load-bearing, not a cache nicety: fused into one codegen stage
    with a pushed-down scan filter, Generate over the giant winnow
    expression re-evaluates it per OUTPUT row (measured: a hang at
    sf0.001 — minutes instead of 0.8s); materializing the arrays
    first makes the explode read computed values. Callers unpersist
    via the ContextCleaner when the frame is garbage collected (the
    similarity-module convention)."""
    from lynx_spark.operators._util import ensure_parallelism

    # r14: spread the fingerprint computation — one md5 PER CHAR
    # POSITION of the normalized text runs in the stage that reads the
    # input, and a small corpus arrives as ONE parquet scan partition,
    # serializing the whole pass on a single core (guide §2.5 input
    # parallelism; measured 5.3s -> sub-second for q110 at sf0.1).
    base = _with_winnow_fps(ensure_parallelism(df), text_col, k, w).select(
        F.col(id_col).alias(out_id), "fps"
    ).persist()
    base.count()  # eager: force the winnow computation ONCE
    return base.select(out_id, F.explode("fps").alias("fp")).distinct()


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_common: int = 2,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Document pairs sharing >= min_common winnowing fingerprints —
    partial-overlap / plagiarism detection (a copied paragraph matches
    even when the rest of both documents differs, which Jaccard-style
    whole-document similarity misses). Same inverted-index +
    document-frequency-cap shape as the shingle joins: fingerprints
    hotter than max_doc_freq are boilerplate and are dropped before
    the self-join (count window fused into the build, no extra
    pass)."""
    from lynx_spark.operators.dedup import cap_doc_freq

    fp = cap_doc_freq(
        _exploded_fps(df, id_col, text_col, k, w, "doc"),
        max_doc_freq,
        key_col="fp",
    )
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


#: GPT-2-style pre-tokenizer, restricted to syntax RE2 (DuckDB) and
#: java.util.regex (Spark) interpret identically — contractions,
#: letter runs, digit runs, non-space symbol runs. The real GPT-2
#: pattern adds lookahead-based space handling RE2 cannot express;
#: this is the standard portable approximation.
BPE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count vs BPE-style pre-token count per row —
    the pair every token-budget decision needs (whitespace counts
    underestimate BPE costs on punctuation- and digit-heavy text; the
    ratio is the correction factor). Pure JVM regexp expressions,
    zero shuffle; the pre-tokenizer pattern is the portable
    (lookahead-free) GPT-2 shape, identical under RE2 and Java
    regex so the DuckDB oracle matches token-for-token."""
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    pre = F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0)
    n_ws = F.size(words).cast("long")
    n_bpe = F.size(pre).cast("long")
    return df.withColumn("n_ws_tokens", n_ws).withColumn(
        "n_bpe_pretokens", n_bpe
    ).withColumn(
        "bpe_ratio",
        F.when(n_ws > 0, F.round(n_bpe / n_ws, 4)),
    )


def bpe_pair_frequencies(
    df: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """Adjacent-character-pair frequencies weighted by word frequency
    — the statistic BPE tokenizer TRAINING computes for its first
    merge (Sennrich et al. 2016: the most frequent symbol pair
    becomes the first merge rule). Returns the ``top_k`` pairs with
    their weighted counts and a deterministic rank (count desc, then
    pair — so both engines agree on ties).

    Scale shape: the only corpus-sized stage is the word-frequency
    aggregate (word-keyed shuffle WITH map-side partial combine — the
    q80 Zipf shape); pair expansion runs over the DISTINCT-word
    vocabulary (model-sized), and top-k fuses into
    TakeOrderedAndProject — no global sort of anything corpus-sized.
    Iterating merges (BPE proper) would re-run this over re-segmented
    symbols; one iteration is the distributed-counting shape all of
    them share."""
    wc = (
        df.select(F.explode(_words(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    pairs = wc.select(
        "wc",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(F.sum("wc").cast("long").alias("n"))
    from pyspark.sql.window import Window

    top = agg.orderBy(F.desc("n"), F.asc("pair")).limit(top_k)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("pair")))
        .cast("long"),
    )


def with_char_class_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-class composition per document — the C4/RefinedWeb
    quality features that catch OCR garbage, code dumps, and
    shouting: uppercase ratio, digit ratio, punctuation ratio, and
    non-ASCII ratio over non-space characters. Pure JVM regexp
    counts (length minus stripped length — no extraction arrays),
    zero shuffle; every class is an explicit character set both Java
    regex and RE2 read identically, so the DuckDB oracle matches
    count-for-count."""
    text = F.col(text_col)

    def _count(pattern: str) -> Column:
        return (
            F.length(text) - F.length(F.regexp_replace(text, pattern, ""))
        ).cast("long")

    n_nonspace = _count(r"[^\s]")
    n_upper = _count(r"[A-Z]")
    n_digit = _count(r"[0-9]")
    n_punct = _count(r"""[!-/:-@\[-`{-~]""")
    n_nonascii = _count(r"[^\x00-\x7F]")
    frac = lambda n: F.when(  # noqa: E731
        n_nonspace > 0, F.round(n / n_nonspace, 4)
    )
    return (
        df.withColumn("n_nonspace", n_nonspace)
        .withColumn("upper_frac", frac(n_upper))
        .withColumn("digit_frac", frac(n_digit))
        .withColumn("punct_frac", frac(n_punct))
        .withColumn("nonascii_frac", frac(n_nonascii))
    )


def incremental_winnow_matches(
    new_df: DataFrame,
    seen_df: DataFrame,
    id_col: str,
    text_col: str,
    min_common: int = 2,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_doc_freq: int | None = 20,
) -> DataFrame:
    """Incremental partial-overlap detection: (new_id, seen_id,
    n_common) for incoming documents sharing >= ``min_common``
    winnowing fingerprints with the ALREADY-INGESTED corpus — the
    winnow tier of the incremental dedup family (exact q56, minhash
    q57, embedding stream tier), catching the copied-paragraph case
    whole-document similarity misses. Bipartite by construction:
    new×seen fingerprint equality only, never new×new or a seen-side
    rescan beyond its fingerprint table (which IS the store shape —
    persist it like the q56/q57 stores). ``max_doc_freq`` caps
    boilerplate fingerprints on the seen side, same guard as
    winnow_overlap_pairs."""
    seen_fp = _exploded_fps(seen_df, id_col, text_col, k, w, "doc")
    return incremental_winnow_matches_from_store(
        new_df, seen_fp, id_col, text_col, min_common, k, w, max_doc_freq
    )


# ------------------------------------------- winnow fingerprint store
#
# The operational tier for the winnow family, mirroring the exact/
# minhash stores (operators/dedup.py): a batch's (doc, fp) rows
# persist as parquet, so a later batch loads the seen side instead of
# re-fingerprinting the whole ingested corpus — at 100 TB the store
# read is a column-pruned parquet scan keyed on fp, the recompute is
# a full-corpus md5 pass.


def build_winnow_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """A batch's (doc, fp) winnow fingerprint rows — the store shape
    incremental_winnow_matches_from_store consumes."""
    return _exploded_fps(df, id_col, text_col, k, w, "doc")


def write_winnow_store(
    fps: DataFrame, path: str, mode: str = "append"
) -> None:
    """Append a batch's (doc, fp) delta to the parquet store —
    append-only, like the exact/minhash stores."""
    fps.select("doc", "fp").write.mode(mode).parquet(path)


def read_winnow_store(spark, path: str) -> DataFrame:
    """The winnow store as the (doc, fp) seen side."""
    return spark.read.parquet(path).select("doc", "fp")


def incremental_winnow_matches_from_store(
    new_df: DataFrame,
    seen_fp: DataFrame,
    id_col: str,
    text_col: str,
    min_common: int = 2,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_doc_freq: int | None = 20,
) -> DataFrame:
    """incremental_winnow_matches with the seen side as an
    ALREADY-FINGERPRINTED (doc, fp) table — the loaded store — so
    batch N+1 never re-derives batch 1..N's fingerprints. Identical
    output to the recompute twin on the same corpus (tested)."""
    from lynx_spark.operators.dedup import cap_doc_freq

    new_fp = _exploded_fps(new_df, id_col, text_col, k, w, "new_id")
    if max_doc_freq is not None:
        seen_fp = cap_doc_freq(seen_fp, max_doc_freq, key_col="fp")
    return (
        new_fp.join(
            seen_fp.select(F.col("doc").alias("seen_id"), "fp"), "fp"
        )
        .groupBy("new_id", "seen_id")
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


#: HTML entities the extractor decodes, in application order (amp LAST
#: so '&amp;lt;' decodes to the literal '&lt;', not to '<' — the
#: standard double-decode bug)
_MARKUP_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(col: Column) -> Column:
    """Markup-to-text extraction — the C4/CommonCrawl acquisition
    step that precedes every other text operator: drop <script>/
    <style> blocks with their contents, strip remaining tags, decode
    the bread-and-butter HTML entities (amp last, so escaped entities
    stay escaped), and collapse the whitespace the removals leave
    behind. Pure JVM regexp chain — zero shuffle, scales with
    executors like the PII scrub it mirrors."""
    # two separate rules instead of <(script|style)>…</\1>: a
    # backreference would be Java-regex-only (RE2 engines — the DuckDB
    # oracle's — have none), and nested <script><style> content is
    # dropped either way
    out = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    # truncated crawl pages: an unterminated script/style block would
    # otherwise leak its JS/CSS body into the extracted text (only the
    # opening tag would strip) — drop the unclosed tail entirely
    out = F.regexp_replace(out, r"(?is)<(?:script|style)\b[^>]*>.*$", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"<[^>]*>", " ")
    for ent, rep in _MARKUP_ENTITIES:
        out = F.regexp_replace(out, ent, rep)
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def with_markup_stripped(
    df: DataFrame, html_col: str, out_col: str = "extracted"
) -> DataFrame:
    """Apply strip_markup and keep the per-document byte accounting
    (raw vs extracted length — the boilerplate-overhead signal crawl
    pipelines monitor)."""
    clean = strip_markup(F.col(html_col))
    return df.withColumn(out_col, clean).withColumn(
        "markup_overhead",
        (F.length(F.col(html_col)) - F.length(clean)).cast("long"),
    )
