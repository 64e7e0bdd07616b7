"""Deduplication operators for training-data pipelines.

Four tiers, each a pure DataFrame transformation designed for the
100 TB case (no driver-side loops, no cross joins — every candidate
generation is a key-equality shuffle join Catalyst can plan):

- exact:   hash-groupBy on the full text (md5 group key)
- n-gram Jaccard: shingle -> inverted-index self-join -> count common
  shingles -> Jaccard threshold. The join key is the shingle, so only
  documents sharing a shingle ever meet — the standard scalable
  candidate-pair pattern.
- MinHash + LSH: per-document minhash signature (md5-string minima, so
  the identical computation is expressible in ANSI SQL for the oracle),
  banded into LSH buckets; only bucket collisions become candidates,
  then candidates are verified with true Jaccard. At scale this is the
  classic shingle->minhash->band->bucket-join pipeline.
- SimHash: 64-bit signature via a vectorized pandas UDF (bit ops are
  the one part Spark exprs can't express cleanly); near-dup candidates
  pair by identical 16-bit bands, verified by Hamming distance.

The reference engine has no dedup surface; these are the BASELINE.json
north-star extensions.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from lynx_spark.operators._util import banded_self_pairs, ensure_parallelism

SHINGLE_N = 3  # word n-gram size
MINHASH_NUM = 12  # number of minhash functions
MINHASH_BANDS = 4  # LSH bands (rows per band = 12/4 = 3)


def _words_col(text_col: str) -> F.Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct text with the
    surviving (minimum) id and the copy count. Map-side partial
    aggregation makes this one shuffle of (fingerprint, partials)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).cast("long").alias("survivor_id"),
            F.count("*").alias("copies"),
        )
    )


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = SHINGLE_N
) -> DataFrame:
    """Distinct (id, shingle) pairs where shingle = space-joined word
    n-gram. Documents with fewer than n words are dropped (no shingle).

    The n-grams are built JVM-side by zip_with-folding n shifted
    slices of the word array (lambdas reference only their own
    arguments, so nothing falls back to the interpreted outer-reference
    path); no Python runs per row."""
    words = _words_col(text_col)
    df = ensure_parallelism(df)
    df = df.select(F.col(id_col).alias("doc"), words.alias("w")).filter(
        F.size("w") >= n
    )
    w = F.col("w")
    length = F.size(w) - (n - 1)
    shingle = F.slice(w, 1, length)
    for k in range(1, n):
        shingle = F.zip_with(
            shingle,
            F.slice(w, k + 1, length),
            lambda acc, nxt: F.concat(acc, F.lit(" "), nxt),
        )
    return df.select("doc", F.explode(shingle).alias("shingle")).distinct()


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SHINGLE_N,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity.

    candidate generation = inverted-index self-join on the shingle
    (only docs sharing a shingle meet); |A ∩ B| falls out of the join
    group count; |A ∪ B| = |A| + |B| - |A ∩ B|. At 100 TB add a
    document-frequency cap on shingles to bound the join fan-out.

    The shingle table feeds three plan branches (sizes + both join
    sides); persisting it turns three explode+distinct passes into one
    (MLlib-style internal persist — the ContextCleaner reclaims it
    when the result DataFrame is garbage collected; at 100 TB this
    becomes a checkpoint to storage)."""
    sh = shingle_table(df, id_col, text_col, n).persist()
    sh.count()  # eager: branches below must read the cache, not race to fill it
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("a_id"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc").alias("b_id"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def _minhash_aggs() -> list[F.Column]:
    """MINHASH_NUM min-aggregations. The 'hash family' is
    md5(seed || ':' || shingle) compared as a string — a uniform
    permutation surrogate whose twin exists in any SQL dialect (the
    oracle runs the byte-identical computation in DuckDB)."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(MINHASH_NUM)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SHINGLE_N,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document MinHash signature + banded LSH bucket hashes.
    Pass a precomputed (persisted) shingle table to share the scan
    with the verification stage."""
    sh = shingles if shingles is not None else shingle_table(df, id_col, text_col, n)
    sig = sh.groupBy("doc").agg(*_minhash_aggs())
    rows_per_band = MINHASH_NUM // MINHASH_BANDS
    for band in range(MINHASH_BANDS):
        cols = [f"mh{band * rows_per_band + r}" for r in range(rows_per_band)]
        sig = sig.withColumn(f"band{band}", F.md5(F.concat_ws("|", *cols)))
    return sig


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SHINGLE_N,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate pairs, verified with true Jaccard.

    Candidates = documents agreeing on at least one LSH band — a
    key-equality self-join per band (shuffle on the band hash), unioned
    and deduped. Only candidates pay the exact-Jaccard verification.

    The shingle table feeds both the signatures and the verification
    joins, and the signature table feeds one join pair per band — one
    persisted copy of each (see jaccard_pairs note)."""
    sh = shingle_table(df, id_col, text_col, n).persist()
    sh.count()  # eager (see jaccard_pairs)
    # sig feeds BOTH sides of the candidate self-join; persist so the
    # 12-way min-agg runs once
    sig = minhash_signatures(df, id_col, text_col, n, shingles=sh).persist()
    sig.count()
    cands = banded_self_pairs(
        sig, "doc", [f"band{b}" for b in range(MINHASH_BANDS)]
    )

    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc").alias("a_id"), "shingle")
    b = sh.select(F.col("doc").alias("b_id"), "shingle")
    common = (
        cands.join(a, "a_id")
        .join(b, ["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("a_id"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc").alias("b_id"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ---------------------------------------------------------------- simhash

_SIMHASH_BITS = 64


def _simhash_one(text: str) -> int:
    """64-bit SimHash over whitespace words, md5-based (deterministic
    across processes — no Python hash randomization)."""
    weights = [0] * _SIMHASH_BITS
    for word in text.split():
        h = int.from_bytes(hashlib.md5(word.encode("utf-8")).digest()[:8], "big")
        for bit in range(_SIMHASH_BITS):
            weights[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(_SIMHASH_BITS):
        if weights[bit] > 0:
            out |= 1 << bit
    # fold into signed 64-bit for Spark LongType
    return out - (1 << 64) if out >= (1 << 63) else out


@F.pandas_udf(LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_simhash_one)


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — Arrow-batched pandas UDF; bit-twiddling is the
    genuinely non-SQL part, everything around it stays JVM-side."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        _simhash_udf(F.col(text_col)).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs whose SimHash Hamming distance <= max_hamming.

    Candidates pair on identical 16-bit bands (pigeonhole: any pair
    within Hamming distance 3 agrees on at least one of 4 bands), so
    candidate generation is again an equality join, not a cross join."""
    sig = simhash_signatures(df, id_col, text_col)
    bands = [
        sig.select(
            F.col("doc_id"),
            F.col("simhash"),
            F.lit(i).alias("band_no"),
            F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("band_val"),
        )
        for i in range(4)
    ]
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cands.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
