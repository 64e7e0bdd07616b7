"""The end-to-end corpus-curation pipeline — the north-star use case
(BASELINE.json): normalize -> exact-dedup -> quality gate -> split,
composed from the individual operators as ONE declarative plan.

Because every stage is a DataFrame transformation, Catalyst sees the
whole pipeline at once: the normalization expression is computed once
per row, the dedup is a single hash aggregation, the quality gate is a
filter over already-computed columns, and the split adds one
projection. No intermediate materialization, one shuffle (the dedup
group-by) end to end — at 100 TB the pipeline cost is one pass plus
one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lynx_spark.functions.text import with_text_stats


def normalize_col(text: F.Column) -> F.Column:
    """lowercase, strip non-alphanumerics, collapse whitespace (the
    q46 canonicalization)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " "), " +", " "
        )
    )


def curate_documents(
    df: DataFrame,
    min_words: int = 20,
    max_stopword_ratio: float = 0.35,
) -> DataFrame:
    """Curated corpus: one row per surviving document with provenance.

    Stages (all one plan):
      1. normalize text
      2. exact dedup on the NORMALIZED text (keep min doc_id)
      3. quality gate: word count + stopword ratio thresholds
      4. deterministic train/test split on the normalized fingerprint

    Output: doc_id, n_copies, n_words, stopword_ratio, split.
    """
    normed = df.withColumn("_norm", normalize_col(F.col("text")))
    survivors = (
        normed.groupBy(F.md5("_norm").alias("_fp"))
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count("*").alias("n_copies"),
            F.first("_norm").alias("_norm"),
        )
    )
    stats = with_text_stats(survivors.withColumnRenamed("_norm", "text"), "text")
    return (
        stats.filter(
            (F.col("n_words") >= min_words)
            & (F.col("stopword_ratio") <= max_stopword_ratio)
        )
        .select(
            "doc_id",
            "n_copies",
            "n_words",
            "stopword_ratio",
            F.when(F.substring(F.col("_fp"), 1, 1) < "c", "train")
            .otherwise("test")
            .alias("split"),
        )
    )
