"""Corpus-curation operators for LLM training-data pipelines:
repetition/quality signals, deterministic sequence packing, stratified
splits, and domain-mixture reweighting.

The reference engine (jdockerty/lynx) has no corpus surface at all —
these extend the training-data operator family (SURVEY §2 extensions)
alongside dedup/similarity/text. Design rule shared by all four:
**shuffle only where the semantics need cross-row state, and then only
within a bounded key space.**

- ``repetition_signals`` is pure per-row array expressions — zero
  shuffles, embarrassingly parallel at any corpus size (the Gopher/
  MassiveText repetition filters are per-document by construction).
- ``pack_sequences`` windows per shard — packing is per-shard in any
  real pipeline precisely so that no global total order exists; a
  global-order window would serialize the corpus through one task.
- ``stratified_split`` windows per stratum (strata are parallel).
- ``mixture_weights`` aggregates to one row per domain — model-sized.

Every operator is deterministic (md5-derived ordering, no RNG), so
the DuckDB oracles compute bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lynx_spark.operators._util import ensure_parallelism
from lynx_spark.operators._util import words_col as _words
from lynx_spark.operators.dedup import _shingle_expr

#: default context-window token budget for sequence packing
PACK_BUDGET = 512


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document repetition metrics (the Gopher-style quality
    signals used to drop boilerplate/spam before training):

    - ``n_words``      — whitespace token count
    - ``dup_word_frac``  — 1 - distinct_words/words (word-level
      repetition; the single-line twin of duplicate-line fraction)
    - ``top_word_frac``  — occurrences of the most frequent word /
      n_words
    - ``top_2gram_frac`` — occurrences of the most frequent word
      2-gram / total 2-grams

    All four are array expressions over the split words — per-row,
    codegen'd, NO shuffle: the frequency scan is O(distinct·n) per
    document, bounded by the document length, which beats an
    explode + two-level groupBy (two full-corpus shuffles) at any
    scale where documents are bounded and the corpus is not."""
    w = F.col("_w")
    top_count = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda x: F.size(F.filter(w, lambda y: y == x)),
        )
    )
    g = F.col("_g")
    top_gram_count = F.array_max(
        F.transform(
            F.array_distinct(g),
            lambda x: F.size(F.filter(g, lambda y: y == x)),
        )
    )
    grams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            _words(text_col).alias("_w"),
        )
        .filter(F.size("_w") >= 2)
        .withColumn("_g", grams)
        .select(
            "doc_id",
            F.size("_w").cast("long").alias("n_words"),
            F.round(
                1 - F.size(F.array_distinct(w)) / F.size(w), 4
            ).alias("dup_word_frac"),
            F.round(top_count / F.size(w), 4).alias("top_word_frac"),
            F.round(top_gram_count / F.size(g), 4).alias("top_2gram_frac"),
        )
    )


def _pack_assign(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    budget: int,
    keep_text: bool = False,
) -> DataFrame:
    """THE packing window shared by pack_sequences, pack_efficiency
    (via pack_sequences) and pack_materialize: per-shard prefix token
    sums in doc-id order, bin = floor(prefix / budget) — one
    definition so the audited bin statistics and the materialized
    training bins can never diverge."""
    tokens = F.size(_words(text_col))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    cols = [
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(shard_col).alias("shard"),
        tokens.cast("long").alias("n_tokens"),
    ]
    if keep_text:
        cols.append(F.col(text_col).alias("_t"))
    return (
        df.select(*cols)
        .withColumn("bin_id", F.floor(prefix / budget).cast("long"))
        .withColumn("bin_offset", (prefix % budget).cast("long"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """Deterministic greedy sequence packing: documents fill
    fixed-``budget`` token bins in ``id`` order within each shard —
    the standard pre-training step that concatenates documents into
    context-window-sized rows. A document lands in the bin its
    cumulative prefix starts in (documents longer than the remaining
    space spill over; real packers then split or pad — the bin
    assignment is the distributed part).

    Tokens = whitespace words (the tokenizer-free approximation; swap
    in a real tokenizer count upstream without changing the shape).
    One window per shard: packing is per-shard so the corpus never
    needs a global total order — shards pack in parallel."""
    return _pack_assign(df, id_col, text_col, shard_col, budget).select(
        "doc_id", "shard", "n_tokens", "bin_id", "bin_offset"
    )


def stratified_split(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Per-stratum train/val/test split: within each stratum, rows
    order by md5 of the id (deterministic shuffle) and the first
    ``train_frac`` become train, the next ``val_frac`` val, the rest
    test — every stratum is split at the same fractions, unlike the
    global hash split (q44) which only hits fractions in expectation.
    Windows partition by the strata, so strata process in parallel
    and no stratum ever needs more than its own rows."""
    strata = [F.col(c) for c in strata_cols]
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata).orderBy(order)
    frac = (F.row_number().over(w) - 1) / F.count("*").over(
        Window.partitionBy(*strata)
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[F.col(c) for c in strata_cols],
        F.when(frac < train_frac, "train")
        .when(frac < train_frac + val_frac, "val")
        .otherwise("test")
        .alias("split"),
    )


def mixture_weights(
    df: DataFrame,
    domain_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Per-domain sampling weights to move the corpus toward a target
    mixture (the DoReMi/Pile-style domain reweighting step): for each
    domain, ``weight = target_frac / actual_frac`` — >1 means
    upsample, <1 downsample. Domains missing from ``targets`` get
    target 0 (dropped). One hash aggregate to domain granularity
    (model-sized output); the total arrives via a single-row broadcast
    join rather than a window, so nothing ever single-partitions."""
    target_map = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").alias("_total"))
    actual = F.col("n_docs") / F.col("_total")
    target = F.coalesce(target_map[F.col("domain")], F.lit(0.0))
    return (
        counts.join(F.broadcast(total))
        .select(
            "domain",
            "n_docs",
            F.round(actual, 6).alias("actual_frac"),
            F.round(target, 6).alias("target_frac"),
            F.round(target / actual, 4).alias("weight"),
        )
    )


def frequent_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_docs: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-level boilerplate detection: the top-``k`` word
    ``n``-grams that appear in at least ``min_docs`` distinct
    documents, with their total occurrence and document counts — the
    signal behind the C4/MassiveText "remove most common lines"
    boilerplate rule (our documents are single-line, so the n-gram is
    the line surrogate).

    Shape at 100 TB: the per-row n-gram build is a codegen'd array
    expression (no explode until after it), then ONE shuffle keyed by
    the n-gram. ``count(*)`` gets map-side partials; the exact
    distinct-document count plans as a two-stage aggregate on
    (ngram, doc_id) — still one key family, and hot boilerplate grams
    are exactly the rows that survive, so partial aggregation absorbs
    the skew. Top-k fuses into TakeOrderedAndProject (no global sort);
    ordering is total (count desc, then the gram itself) so the kept
    set is deterministic under any partitioning."""
    w = F.col("_w")
    return (
        ensure_parallelism(df).select(
            F.col(id_col).cast("long").alias("doc_id"),
            _words(text_col).alias("_w"),
        )
        .filter(F.size(w) >= n)
        .select("doc_id", F.explode(_shingle_expr(w, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(k)
    )


def duplicated_window_fraction(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Per-document duplicated-span fraction: slide a ``k``-word
    window over each document, md5 each window, and report what
    fraction of a document's windows also occur in ANOTHER document —
    the window-granular approximation of exact-substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better": duplicated 50-token spans; we window words).

    Plan: one codegen'd window build per row, then exactly two
    shuffles and ONE pass over the exploded windows — "occurs in more
    than one document" is min(doc_id) ≠ max(doc_id) over a window
    partitioned by the hash (cheaper than the equivalent
    countDistinct-groupBy + join-back, which scans the exploded
    windows twice and adds a join), followed by the per-document
    re-aggregation. Window hashes are high-cardinality
    (near-unique), so both shuffles distribute evenly; the md5 keeps
    the shuffle key at 32 bytes regardless of ``k``. Within-document
    repeats don't count as duplication (the min≠max test is exactly
    cross-document), matching the dedup semantics rather than the
    repetition signals (q49)."""
    w = F.col("_w")
    windows = (
        ensure_parallelism(df).select(
            F.col(id_col).cast("long").alias("doc_id"),
            _words(text_col).alias("_w"),
        )
        .filter(F.size(w) >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(_shingle_expr(w, k), lambda s: F.md5(s))
            ).alias("h"),
        )
    )
    by_hash = Window.partitionBy("h")
    is_dup = (
        F.min("doc_id").over(by_hash) != F.max("doc_id").over(by_hash)
    ).cast("long")
    dup = F.sum("_dup")
    return (
        windows.withColumn("_dup", is_dup)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            dup.alias("n_dup_windows"),
            F.round(dup / F.count("*"), 4).alias("dup_window_frac"),
        )
    )


def ngram_decontaminate(
    train: DataFrame,
    holdout: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM n-gram rule): flag
    every training document that shares at least one word ``n``-gram
    with the held-out evaluation set, returning ``(doc_id,
    n_shared_grams)`` for the flagged documents — the upstream step
    before dropping or splitting them out of the corpus.

    Per-document grams are distinct'd BEFORE the join (array_distinct
    inside the row, no shuffle), so a gram repeated inside one
    training document counts once. The holdout side collapses to its
    distinct gram set and is broadcast — eval benchmarks are MBs
    against a 100 TB corpus, so the contamination check is a
    broadcast-hash semi-join embedded in the training scan: zero
    shuffles on the big side until the tiny per-doc count aggregate."""
    w = F.col("_w")

    def grams(df: DataFrame) -> DataFrame:
        return (
            ensure_parallelism(df).select(
                F.col(id_col).cast("long").alias("doc_id"),
                _words(text_col).alias("_w"),
            )
            .filter(F.size(w) >= n)
            .select(
                "doc_id",
                F.explode(
                    F.array_distinct(_shingle_expr(w, n))
                ).alias("g"),
            )
        )

    holdout_grams = grams(holdout).select("g").distinct()
    return (
        grams(train)
        .join(F.broadcast(holdout_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def temperature_mixture(
    df: DataFrame, domain_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled domain sampling (the multilingual-corpus
    rebalancing rule: p_i ∝ n_i^alpha, alpha < 1 upsamples the tail):
    per domain, the natural fraction, the temperature-scaled sampling
    fraction, and the implied up/down-sampling factor.

    One hash aggregate to domain granularity, then a single-row
    broadcast join carries both normalizers — model-sized all the way
    after the first scan, same shape as ``mixture_weights``.

    ``alpha=0.5`` maps the power to ``sqrt``, which IEEE 754 requires
    to be correctly rounded — so Spark and any oracle engine agree
    bit-for-bit; a generic ``pow`` is only faithfully rounded and may
    differ in the last ulp across libm implementations, which matters
    because results cross an exact-hash comparison. The normalizer
    Σ sqrt(n_i) is itself a float sum, so it accumulates pre-rounded
    terms as a DECIMAL (exact, order-independent — the q78 pattern;
    r5 review: a plain double sum depends on partial-agg order)."""
    scaled = (
        F.sqrt(F.col("n_docs"))
        if alpha == 0.5
        else F.pow(F.col("n_docs"), F.lit(alpha))
    )
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    totals = counts.select(
        F.sum("n_docs").alias("_total"),
        F.sum(F.round(scaled, 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("_total_scaled"),
    )
    natural = F.col("n_docs") / F.col("_total")
    temp = scaled / F.col("_total_scaled")
    return counts.join(F.broadcast(totals)).select(
        "domain",
        "n_docs",
        F.round(natural, 6).alias("natural_frac"),
        F.round(temp, 6).alias("temp_frac"),
        F.round(temp / natural, 4).alias("sample_factor"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size overlapping chunks (the
    long-document step before packing/embedding: context windows of
    ``max_tokens`` words advancing by ``max_tokens - overlap``). One
    row per chunk with its 0-based ``chunk_id``, 1-based
    ``start_word``, actual length (the tail chunk may be short — both
    engines clamp slices at the end) and the chunk text.

    Pure per-row array expressions + one posexplode-shaped expansion
    — zero shuffles, parallel at any corpus size; output volume is
    bounded by ``n/(max_tokens-overlap)`` chunks per document."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    w = F.col("_w")
    # starts stop at n - overlap: a later start would emit a chunk
    # fully contained in the previous one (r5 review: with defaults,
    # any doc with stride < n <= max_tokens duplicated its tail);
    # coverage still holds — the last start exceeds n - max_tokens
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.size(w) - overlap),
        F.lit(stride),
    )
    return (
        ensure_parallelism(df).select(
            F.col(id_col).cast("long").alias("doc_id"),
            _words(text_col).alias("_w"),
        )
        .filter(F.size(w) >= 1)
        .select(
            "doc_id",
            F.col("_w"),
            F.explode(starts).alias("start_word"),
        )
        .select(
            "doc_id",
            (
                (F.col("start_word") - 1) / stride
            ).cast("long").alias("chunk_id"),
            F.col("start_word").cast("long").alias("start_word"),
            F.size(F.slice(w, F.col("start_word"), max_tokens))
            .cast("long")
            .alias("chunk_len"),
            F.array_join(
                F.slice(w, F.col("start_word"), max_tokens), " "
            ).alias("chunk_text"),
        )
    )


def paragraph_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, para_tokens: int = 20
) -> DataFrame:
    """Sub-document (paragraph-granular) exact dedup, the Dolma/CCNet
    dedup mode between whole-document (exact dedup) and sliding-window
    (duplicated-windows) granularity: split every document into
    non-overlapping ``para_tokens``-word paragraphs, hash each, and
    keep only the FIRST occurrence of each paragraph corpus-wide
    (first = smallest (doc_id, chunk_id), the deterministic rule both
    engines share). Returns per-document n_paras / n_kept / kept_frac
    — the retained-fraction signal a curation pipeline thresholds on
    (a document whose paragraphs all appear earlier elsewhere is pure
    boilerplate even when no whole-document twin exists).

    Plan: the paragraph split is per-row array expressions (zero
    shuffle, chunk_documents with overlap=0); first-occurrence is
    min(doc_id·1e5 + chunk_id) over a Window keyed by the paragraph
    hash — the q66 shape: ONE hash-keyed exchange, no join — then one
    doc-keyed aggregate. chunk_id < 1e5 always holds (it is bounded
    by words-per-doc / para_tokens), so the packed key is collision-
    free and fits a long at any doc_id the testdata or a 100 TB
    corpus uses."""
    paras = chunk_documents(
        df, id_col, text_col, max_tokens=para_tokens, overlap=0
    ).select(
        "doc_id",
        "chunk_id",
        F.md5(F.col("chunk_text")).alias("_h"),
    )
    key = F.col("doc_id") * 100000 + F.col("chunk_id")
    first = F.min(key).over(Window.partitionBy("_h"))
    return (
        paras.withColumn("_kept", (key == first).cast("int"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_paras"),
            F.sum("_kept").cast("long").alias("n_kept"),
        )
        .withColumn(
            "kept_frac", F.round(F.col("n_kept") / F.col("n_paras"), 4)
        )
    )


def sample_per_domain(
    df: DataFrame, id_col: str, domain_col: str, budget: int
) -> DataFrame:
    """Deterministic per-domain downsampling to a document budget:
    within each domain, order by md5 of the id (a reproducible
    shuffle — the same device q44/q51 use) and keep the first
    ``budget`` documents. The *application* of mixture decisions
    (q52/q68 compute the weights; this materializes a capped sample
    per domain).

    One window shuffle keyed by the domain; domains sample in
    parallel and no task holds more than its domain's rows. At
    100 TB a skewed giant domain is the watch item — same note as
    quality.top_fraction: pre-aggregate to per-domain counts and
    hash-threshold when one domain outgrows a task."""
    # the window resolves against the RENAMED frame, so it must order
    # by doc_id, not id_col (r5 review: any id_col other than literal
    # "doc_id" failed to resolve)
    order = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("domain").orderBy(order, F.col("doc_id"))
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(domain_col).alias("domain"),
        )
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= budget)
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    score: DataFrame,
    score_col: str,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Global best-first corpus selection under a token budget —
    WITHOUT a global sort: keep the highest-``score_col`` documents
    until ``budget_frac`` of the corpus's tokens are spent, at
    histogram-bucket granularity (scores round to 2dp buckets; whole
    buckets are taken best-first while the running total stays within
    budget — the last bucket that would overflow is dropped entirely).

    This is the scale-correct shape for "take the best X% of tokens":
    a naive rank-then-cumsum orders the whole corpus through one
    window partition, serializing 100 TB through one task. Here
    per-bucket token sums aggregate to a model-sized frame (≤ a few
    thousand buckets), the cumulative threshold is computed THERE,
    and the corpus-side work is one broadcast-joined filter — same
    two-phase pattern as quality.top_fraction's histogram note.

    Bucket granularity trades selection precision for scalability;
    callers needing exact-token cuts re-rank only the single boundary
    bucket (bounded work).

    ``score`` must carry a ``doc_id`` column keyed like ``id_col``
    (the convention every quality-score producer here emits — same
    contract as cluster_best_survivors)."""
    tokens = F.size(_words(text_col))
    docs = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens.cast("long").alias("n_tokens"),
    ).join(
        score.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(score_col).alias("_s"),
        ),
        "doc_id",
    )
    bucketed = docs.withColumn("bucket", F.round(F.col("_s"), 2))
    per_bucket = bucketed.groupBy("bucket").agg(
        F.sum("n_tokens").alias("_bt")
    )
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = per_bucket.select(F.sum("_bt").alias("_total"))
    kept_buckets = (
        per_bucket.join(F.broadcast(total))
        .withColumn("_cum", F.sum("_bt").over(w))
        .filter(F.col("_cum") <= budget_frac * F.col("_total"))
        .select("bucket")
    )
    return (
        bucketed.join(F.broadcast(kept_buckets), "bucket")
        .select(
            "doc_id",
            F.col("_s").alias(score_col),
            "n_tokens",
        )
    )


def pack_efficiency(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """Packing-efficiency audit over ``pack_sequences``: per shard,
    how full the fixed-budget bins actually are and how many documents
    spill across a bin boundary — the feedback metric a pre-training
    pipeline watches when tuning the context-window budget (low fill
    ⇒ wasted compute on padding; high spill ⇒ many truncated/split
    documents).

    All inputs are exact longs from the packing window, so every
    statistic is a deterministic integer aggregate (the only doubles
    are final rounded ratios of exact sums). One aggregate at shard
    granularity on top of the packing window — output is model-sized
    (one row per shard)."""
    packed = pack_sequences(df, id_col, text_col, shard_col, budget)
    spills = F.when(
        F.col("bin_offset") + F.col("n_tokens") > budget, 1
    ).otherwise(0)
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.max("bin_id") + 1).cast("long").alias("n_bins"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(spills).cast("long").alias("n_spill_docs"),
        )
        .select(
            "shard",
            "n_docs",
            "n_bins",
            "total_tokens",
            F.round(
                F.col("total_tokens") / (F.col("n_bins") * F.lit(budget)), 4
            ).alias("fill_frac"),
            "n_spill_docs",
            F.round(F.col("n_spill_docs") / F.col("n_docs"), 4).alias(
                "spill_frac"
            ),
        )
    )


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word ``n``-grams whose FIRST corpus occurrence (minimum
    doc id over all documents containing the gram) is this document —
    the memorization/boilerplate lens dual to exact-substring dedup
    (q66): novelty ≈ 1 means original content, ≈ 0 means the document
    restates earlier text. Documents shorter than ``n`` words emit
    n_grams = 0 and NULL novelty (no gram evidence either way).

    Scale shape: ONE exchange partitions the gram stream by gram; the
    per-gram minimum doc id is a window over that partitioning (an
    unbounded MIN needs no sort — Spark plans a partition-wide frame),
    so no vocabulary table materializes and no join back is needed
    (an earlier groupBy+join form scanned the corpus twice and cost
    three extra exchanges — plan-audited); one further groupBy
    re-aggregates to document granularity. No self-join, no
    corpus-wide window — the partition key is the gram, whose
    cardinality grows with vocabulary, not corpus size."""
    from pyspark.sql.window import Window

    d = ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("doc_id"),
        _words(text_col).alias("w"),
    )
    grams = d.filter(F.size("w") >= n).select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_expr(F.col("w"), n))).alias("g"),
    )
    first_seen = grams.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("g"))
    )
    per_doc = (
        first_seen
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    # left join restores docs shorter than n words (no grams at all)
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            # NULL novelty for gram-less docs (ANSI mode: guard the /0)
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_novel") / F.col("n_grams"), 4),
            ).alias("novelty"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    window: int = 8,
) -> DataFrame:
    """Cross-source contamination matrix: for every ordered pair of
    distinct sources (a < b), how many distinct ``window``-word
    shingle hashes appear in BOTH — the corpus-level view of
    exact-substring duplication (q66 reports per-document fractions;
    this reports WHICH domains share content, the mirror-site /
    syndication detector that decides whether two crawl sources
    should be deduped against each other).

    Scale shape: the shingle stream collapses to distinct
    (hash, source) rows FIRST (one aggregation — md5 window hashes
    are near-unique, so this is the big-but-linear step; md5 because
    the DuckDB oracle computes the identical digest), then the
    per-hash source set (bounded by the number of sources, not the
    corpus) expands to source pairs via codegen array expressions —
    no self-join on the hash key, no quadratic term anywhere: output
    and intermediate are both bounded by sources², a model-sized
    frame."""
    d = ensure_parallelism(df).select(
        F.col(source_col).alias("source"),
        _words(text_col).alias("w"),
    )
    hashes = d.filter(F.size("w") >= window).select(
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    _shingle_expr(F.col("w"), window),
                    lambda s: F.md5(s),
                )
            )
        ).alias("h"),
    )
    per_hash = hashes.groupBy("h").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    pairs = per_hash.filter(F.size("srcs") >= 2).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("srcs"),
                    lambda a, i: F.transform(
                        F.slice(F.col("srcs"), i + F.lit(2), F.size("srcs")),
                        lambda b: F.struct(a.alias("a"), b.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
        )
        .agg(F.count("*").cast("long").alias("shared_windows"))
    )


def pack_materialize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    budget: int = PACK_BUDGET,
    eos: str = " <eos> ",
) -> DataFrame:
    """Materialize ``pack_sequences``'s bin assignment into actual
    training rows: one row per (shard, bin) with the member documents
    concatenated in id order behind ``eos`` separators — the final
    step that turns a curated corpus into fixed-budget context-window
    rows ready for tokenization.

    Shape: the same per-shard packing window as q50 (documents keep
    their text through it), then ONE aggregation to (shard, bin)
    granularity: members collect as (doc_id, text) structs, sort by
    the struct's leading doc_id (deterministic regardless of
    accumulation order), and join behind ``eos``. The collected array
    is bounded by the bin budget — a bin holds at most
    ``budget``-ish tokens by construction, so the per-group state is
    context-window-sized, never corpus-sized (the one long document
    that spills past the budget is still a single member)."""
    assigned = _pack_assign(
        df, id_col, text_col, shard_col, budget, keep_text=True
    )
    members = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id"), F.col("_t").alias("t")))
    )
    return (
        assigned.groupBy("shard", "bin_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(members, lambda m: m.getField("t")), eos
            ).alias("packed_text"),
        )
    )


def export_balanced_shards(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n_shards: int = 32,
) -> DataFrame:
    """Materialize a curated corpus as ``n_shards`` hive-partitioned
    parquet shards (``shard=K/``) balanced by document hash — the
    export step that hands a training corpus to a data loader. Shard
    assignment is md5-uniform (balanced in expectation, independent
    of doc-id clustering or source skew) and DETERMINISTIC: the same
    corpus always exports byte-identical shard membership, so
    training runs are reproducible from the manifest alone.

    One write, no pre-shuffle beyond the partitioned write itself;
    returns the shard manifest (docs + tokens per shard — the frame
    a loader uses to plan epochs) computed from the written data, so
    the manifest can never disagree with the files."""
    from lynx_spark.operators.dedup import base_hash_expr

    # NULL text coalesces to '' so every document lands in a real
    # shard=K directory (NULL would route to __HIVE_DEFAULT_PARTITION__
    # outside the documented layout) — and the shared base_hash_expr
    # is the one tested md5→long derivation, not a private variant
    txt = F.coalesce(F.col(text_col), F.lit(""))
    shard = (base_hash_expr(txt) % n_shards).cast("long")
    out = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.coalesce(F.size(_words(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        shard.alias("shard"),
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    written = df.sparkSession.read.parquet(path)
    return (
        written.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("shard")
    )


def pps_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    expected_k: float = 100.0,
) -> DataFrame:
    """Poisson probability-proportional-to-size (PPS) sampling with
    Horvitz-Thompson inverse-probability weights: document *i* is
    included iff u_i < k·w_i / W, so inclusion probability is
    π_i = min(1, k·w_i/W) and E[sample size] ≈ k. The survey-sampling
    way to thin a corpus toward a token budget while keeping every
    downstream aggregate unbiased (estimate Σf by Σ f/π over the
    sample).

    Deterministic and engine-portable by construction: u_i is the
    shared 60-bit md5 hash of the id divided by 2^60, and the
    selection predicate uses only IEEE-correctly-rounded operations
    (int→double conversion, multiply, divide) on bit-identical
    inputs — so Spark and the DuckDB oracle select the exact same
    set, with no transcendental in the decision path (the
    Efraimidis-Spirakis exponential-key formulation would put ln()
    inside the ORDER BY, where a 1-ulp libm difference could flip a
    rank; the Poisson design needs no sort at all).

    100 TB shape: ONE tiny total-weight aggregation broadcast back,
    then a pure map-side filter — no global sort, no shuffle of the
    data itself, unlike top-k reservoir designs.

    Weights may be fractional: both the per-row numerator and the
    total use the same 9dp-rounded double (decimal-summed, so the
    total is exact and order-free). The ``weight`` OUTPUT column
    stays BIGINT (the q114 oracle contract) — fractional weights
    participate exactly in the probabilities but render truncated
    there; read ``incl_prob``/``ht_weight`` for estimation."""
    from lynx_spark.operators.dedup import base_hash_expr

    # numerator and denominator use the SAME 9dp-rounded weight: the
    # total sums it as DECIMAL (exact, order-free — the q68 device),
    # so fractional weights are honored instead of truncated, and for
    # integral weights the total is bit-identical to an integer sum
    w = F.round(F.col(weight_col).cast("double"), 9)
    total = df.agg(
        F.sum(w.cast("decimal(38,9)")).cast("double").alias("_w_total")
    )
    u = base_hash_expr(F.col(id_col).cast("string")) / F.lit(
        float(1 << 60)
    )
    pi_raw = F.lit(float(expected_k)) * w / F.col("_w_total").cast("double")
    return (
        df.crossJoin(F.broadcast(total))
        .withColumn("_u", u)
        .filter(F.col("_u") < pi_raw)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(weight_col).cast("long").alias("weight"),
            F.round(F.least(pi_raw, F.lit(1.0)), 9).alias("incl_prob"),
            F.round(
                F.lit(1.0) / F.least(pi_raw, F.lit(1.0)), 6
            ).alias("ht_weight"),
        )
    )


def curriculum_interleave(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    difficulty_col: str,
) -> DataFrame:
    """Curriculum training order with round-robin domain interleaving:
    within each domain, documents rank easiest-first (``stage`` =
    row_number by the difficulty column); the global training
    position is the CLOSED FORM pos = (stage-1)·n_domains +
    domain_idx, which interleaves domains at every stage (easy docs
    from all domains first, no domain streak longer than 1) without
    any global sort. Positions are strictly ordering priorities —
    unequal domain sizes leave gaps once small domains exhaust, which
    a loader's ORDER BY pos ignores.

    100 TB shape: one window shuffle keyed by domain (same cost
    envelope as stratified_split); the domain dimension is a
    distinct-aggregate of model size, broadcast back. Contrast with
    the naive ORDER BY (difficulty, …) over the full corpus — a
    global range-exchange this formulation never pays."""
    w = Window.partitionBy("domain").orderBy(
        F.col(difficulty_col), F.col("doc_id")
    )
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(domain_col).alias("domain"),
        F.col(difficulty_col),
    )
    dim = (
        base.select("domain")
        .distinct()
        .withColumn(
            "domain_idx",
            F.row_number().over(Window.orderBy("domain")).cast("long"),
        )
    )
    dim = dim.crossJoin(
        F.broadcast(dim.agg(F.count("*").cast("long").alias("n_domains")))
    )
    return (
        base.withColumn("stage", F.row_number().over(w).cast("long"))
        .join(F.broadcast(dim), "domain")
        .select(
            "doc_id",
            "domain",
            "stage",
            (
                (F.col("stage") - 1) * F.col("n_domains")
                + F.col("domain_idx")
            ).cast("long").alias("pos"),
        )
    )


def materialize_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    tokens_col: str,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Materialize a temperature mixture into an actual document
    selection: the APPLICATION step after q52/q68 compute weights.
    Each domain gets a token quota floor(temp_frac · budget) (p_d ∝
    n_d^alpha — the multilingual rebalancing rule), and documents
    fill their domain's quota in md5-of-id order (the reproducible
    shuffle q44/q73 use) until the running token total would exceed
    it. Output = the selected corpus with per-domain quota and
    running total, ready to hand to packing/export.

    100 TB shape: the mixture weights come from temperature_mixture's
    domain-granular aggregate (model-sized, broadcast back); the
    selection is ONE window shuffle keyed by domain — never a global
    sort. alpha=0.5 keeps the power IEEE-exact (sqrt) and the
    normalizer is decimal-summed, so quotas are bit-identical in the
    SQL twin."""
    quotas = temperature_mixture(df, domain_col, alpha=alpha).select(
        "domain",
        F.floor(F.col("temp_frac") * F.lit(int(budget)))
        .cast("long")
        .alias("quota_tokens"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(domain_col).alias("domain"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    return (
        base.join(F.broadcast(quotas), "domain")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= F.col("quota_tokens"))
        .select(
            "doc_id", "domain", "n_tokens", "cum_tokens", "quota_tokens"
        )
    )


def corpus_checksum(
    df: DataFrame, id_col: str, text_col: str, group_col: str | None = None
) -> DataFrame:
    """Order-insensitive corpus content checksum — the reproducibility
    manifest entry a training run pins: per group (or globally), the
    document count and the exact DECIMAL sum of every document's
    60-bit content hash over (id, text). Any added, dropped, or
    edited document changes the sum; identical corpora match across
    engines, partitionings, and runs BECAUSE the sum is exact integer
    arithmetic (a double sum would be partial-aggregation-order
    dependent and a concat-then-hash would need a global sort).

    One map-side-partial aggregation to group granularity; nothing
    else. The content twin of export_balanced_shards' manifest."""
    from lynx_spark.operators.dedup import base_hash_expr

    h = base_hash_expr(
        F.concat(F.col(id_col).cast("string"), F.lit("|"), F.col(text_col))
    ).cast("decimal(38,0)")
    keys = [F.col(group_col).alias("grp")] if group_col else []
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum(h).cast("decimal(38,0)").alias("content_sum"),
    ]
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)


def repetition_plan(
    df: DataFrame,
    domain_col: str,
    tokens_col: str,
    budget: int,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Data-constrained repetition planning (Muennighoff et al. 2023,
    arXiv:2305.16264): when the temperature mixture asks a tail
    domain for more tokens than it has, repeat it — up to
    ``max_epochs`` passes, past which repeated data stops helping —
    and report the shortfall that must come from elsewhere. Per
    domain: available tokens, the mixture's target, raw and capped
    epoch counts, plannable tokens min(target, max_epochs·avail),
    and the unmet shortfall. The planning step between computing
    mixture weights (q68) and materializing a selection (q118).

    Domain-granular throughout: ONE aggregation to (domain → docs,
    tokens), the sqrt-temperature normalizer decimal-summed exactly
    as temperature_mixture does, everything after runs on the
    model-sized domain frame."""
    # the weights come from temperature_mixture itself — ONE
    # definition of the bit-exactness-critical sqrt/decimal-sum
    # recipe (r5 review: an inline copy here could silently de-sync
    # from the q68 oracle if either rounding ever changed)
    weights = temperature_mixture(df, domain_col, alpha=0.5).select(
        "domain", "temp_frac"
    )
    tokens = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(tokens_col).cast("long")).cast("long").alias(
            "avail_tokens"
        ),
    )
    target = F.col("temp_frac") * F.lit(float(budget))
    avail = F.col("avail_tokens").cast("double")
    raw_epochs = target / avail
    planned = F.least(target, F.lit(max_epochs) * avail)
    return tokens.join(F.broadcast(weights), "domain").select(
        "domain",
        "avail_tokens",
        F.round(target, 2).alias("target_tokens"),
        F.round(raw_epochs, 4).alias("epochs_raw"),
        F.round(F.least(raw_epochs, F.lit(max_epochs)), 4).alias(
            "epochs_capped"
        ),
        F.round(planned, 2).alias("planned_tokens"),
        F.round(target - planned, 2).alias("shortfall_tokens"),
    )
