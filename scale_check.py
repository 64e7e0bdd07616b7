#!/usr/bin/env python
"""Scale trajectory check: synthesize an N-times copy of the sf0.1
fact tables (key-shifted so cardinalities really grow) and time the
core relational queries at 1x vs Nx. Prints one JSON line.

This is the would-it-survive-100TB smoke: per-query time should grow
~linearly with fact size (scan+shuffle bound), not quadratically, and
broadcast joins must stay broadcast while only fact-side shuffles grow.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

FACTOR = int(os.environ.get("SCALE_FACTOR", "10"))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(os.environ.get("SCALE_OUT_DIR", "/tmp/lynx_scale")) / f"x{FACTOR}"

QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q07_window_rank",
    "q12_events_daily",
    "q21_dedup_exact",
    # dedup / similarity / corpus / quality at replicated-document and
    # replicated-embedding scale: the families where quadratic
    # candidate generation would show as a superlinear time ratio
    "q22_ngram_jaccard",
    "q23_minhash_lsh",
    "q25_ann_lsh",
    "q49_repetition_signals",
    "q53_word_entropy",
    "q54_profile",
    "q55_constraints",
    # round 3: cluster resolution (iterative joins), corpus-LM scoring
    # (word-frequency join with hot stopword keys), percentile gate
    # (per-domain window), PII scrub (pure per-row regex)
    "q58_dedup_clusters",
    "q60_unigram_lm",
    "q62_entropy_gate",
    "q63_pii_scrub",
    # round 5: corpus boilerplate (gram-keyed agg with hot keys),
    # sliding-window substring dedup (two shuffles on a near-unique
    # hash), decontamination (broadcast semi join), Gopher filter
    # (pure per-row arrays)
    "q65_frequent_ngrams",
    "q66_duplicated_windows",
    "q67_decontaminate",
    "q69_gopher_filter",
    # round-5b: chunk explode, WindowGroupLimit sampling, vocab-join
    # tf-idf, candidate-join sketch audit, decimal-agg centroid audit
    "q72_chunk_documents",
    "q73_domain_sample",
    "q76_tfidf_terms",
    "q77_sketch_audit",
    "q78_centroid_audit",
    # session B: kNN graph (banded self-pairs over replicated
    # embeddings — THE quadratic-risk shape), novelty (gram-keyed
    # window with hot keys under replication), quantization audit
    # (posexplode agg + literal), BM25 (filtered token stream),
    # classifier (pure per-row)
    "q83_knn_graph",
    "q84_quality_classifier",
    "q87_ngram_novelty",
    "q88_quantization_audit",
    "q89_bm25_search",
    # session B tail: source-set overlap (near-unique hash agg),
    # packed-bin string materialization, media content via
    # mapInPandas (image pixels / audio samples / video frames),
    # regex pre-tokenizer
    "q91_source_overlap",
    "q92_pack_materialize",
    "q94_image_features",
    "q95_audio_features",
    "q96_video_frames",
    "q97_bpe_pretokens",
    # session B audits/composites: hybrid RRF (two top-k legs),
    # curation funnel (gates + CC), recall audits (bucket joins +
    # brute-force truth over a fixed query sample), dataset card
    "q93_hybrid_search",
    "q99_curation_funnel",
    "q105_ann_recall",
    "q107_dataset_card",
    # session C: histogram percent-rank (must NOT global-sort under
    # growth), incremental winnow (bipartite fingerprint join — the
    # newest quadratic-risk candidate generator)
    "q109_approx_ranks",
    "q110_incremental_winnow",
    # paragraph-granular dedup: hash-keyed window (the q66 shape)
    "q111_paragraph_dedup",
    # BPE pair stats: word-keyed agg w/ map-side combine (q80 shape)
    "q112_bpe_pair_freqs",
    # vocab coverage: vocabulary window + sizes broadcast
    "q113_vocab_coverage",
    # PPS sample: one broadcast total + map-side filter, no sort
    "q114_pps_sample",
    # curriculum interleave: one domain-keyed window, NO global sort
    "q115_curriculum_interleave",
    # PSI drift: two count aggs to category cardinality + tiny join
    "q116_drift_psi",
    # KS drift: histogram-granular ECDFs, no global sort
    "q117_drift_ks",
    # mixture materialization: broadcast quotas + one domain window
    "q118_mixture_materialize",
    # logreg training: one aggregation per gradient iteration
    "q119_train_classifier",
    # hard negatives: broadcast-anchor join (the q24/q83 shape)
    "q120_hard_negatives",
    # classifier eval: score-bucket histogram + 9-row threshold join
    "q121_classifier_eval",
    # markup extraction: pure per-row regexp chain, zero shuffle
    "q122_strip_markup",
    # corpus checksum: one map-side-partial decimal aggregate
    "q123_corpus_checksum",
    # feature correlations: one moment aggregation for all pairs
    "q124_feature_corr",
    # dedup threshold sweep: pair frame built once, 7-row threshold join
    "q125_dedup_threshold_sweep",
    # repetition planner: one domain aggregation, model-sized after
    "q126_repetition_plan",
    # PageRank: per-iteration edges-ranks join + dst-keyed aggregate
    "q127_pagerank",
    # NB train+eval: two count aggs, one words-counts join, argmax window
    "q128_nb_langid_eval",
    # PQ audit: model-sized training collects, per-row literal folds
    "q129_pq_audit",
    # JL distortion: sample-bounded pair audit, corpus scanned once
    "q130_jl_distortion",
    # IVF-PQ: cell-equality candidates, codebook ADC folds
    "q131_ivfpq_search",
    # count-min audit: vocabulary-granular sketch build + bucket joins
    "q132_countmin_audit",
    # HLL from scratch: one aggregation to 256 register rows
    "q133_hll_audit",
    # grouped HLL: (group, idx) registers, groups x 256 state
    "q134_hll_per_source",
    # KMV set ops: k-row-granular after the distinct-hash aggregate
    "q135_kmv_set_ops",
    # triangles: equality self-joins, wedge fan-out capped by kNN degree
    "q136_triangle_stats",
    # weighted PageRank: same join+agg iterations, decimal normalizers
    "q137_weighted_pagerank",
    # label propagation: per-round join + integer-vote argmax window
    "q138_label_propagation",
    # bigram backoff: two count aggs + unique-build-key score joins
    "q139_bigram_backoff",
    # HITS: per half-step one edges-scores join + one aggregation
    "q140_hits",
    # round 7 store-backed tier: first rep builds the store for the
    # measured sf_dir, later reps read parquet — min-of-reps is the
    # query-cadence cost, i.e. the centrality/search passes WITHOUT
    # the kNN build / IVF-PQ training the inline twins above pay
    "q141_pagerank_stored",
    "q142_hits_stored",
    "q143_triangles_stored",
    "q144_label_prop_stored",
    "q145_wpagerank_stored",
    "q146_ivfpq_stored",
    # BPE trainer: corpus touched once (word counts); every merge is
    # vocabulary-granular with a 1-row broadcast argmax
    "q147_bpe_train",
    # BPE application: unique-build-key doc-words join + doc aggregate
    "q148_bpe_tokenize",
    # round 7: warehouse/curation additions
    "q149_cohort_retention",   # user-keyed shuffle, cohort-granular agg
    "q150_scd2_history",       # single user partition, windows inside
    "q151_ewma_smooth",        # lag-only, zero extra shuffles
    "q152_zonemap_audit",      # zone build is the only corpus scan
    "q153_skyline",            # price-distinct sort, never all-pairs
    "q154_zorder_layout",      # 4-scalar broadcast + bucket agg
    "q155_phrase_search",      # positional index, co-partitioned join
    "q156_entity_match",       # block-local candidate quadratics
    "q157_modularity",         # label broadcast, community-granular
    "q158_kcenter_sample",     # k x (1-row broadcast + linear scan)
    # round 7 batch 2: recursion, interval sweep, robust stats, folds
    "q159_recursive_calendar",  # recursion depth = days, not rows
    "q160_peak_concurrency",   # linear sweep-line, day-partitioned
    "q161_rolling_distinct",   # x7 fan-out equi-join, no range join
    "q162_mad_anomaly",        # two percentile passes + 5-row bcast
    "q163_holt_forecast",      # per-series array fold, one shuffle
    "q164_kcore_peel",         # degree agg + semi-joins per round
    "q165_winsorize",          # percentile pass + integer moments
    "q166_funnel_conversion",  # chained user-keyed min-aggregations
    "q167_cusum_changepoint",  # day-bounded per-series array folds
    "q168_weighted_sample_wor",  # TakeOrdered partial top-k
    "q169_markov_transitions",   # one lag window, constant matrix
    "q170_prefix_filter_join",  # rare-token candidate join, no all-pairs
    "q171_stratified_wor",      # per-source rank window, WindowGroupLimit
    "q172_sorted_neighborhood",  # blocked sort + windowed candidates
    "q173_fuzzy_name_match",    # vocabulary-sized blocked self-join
    "q174_key_skew_audit",      # r8: fof-histogram Gini, no key rank
    # round-7 batch 5
    "q175_link_prediction",     # capped wedge join over kNN edges
    "q176_basket_rules",        # within-order pair join, 25-row dims
    "q177_rfm_segments",        # r8: bucket-partitioned two-phase ntile
    "q178_acf",                 # one daily agg, day-cardinality joins
    "q179_pareto_abc",          # r8: bucket-partitioned running sum
    "q180_benford_audit",       # zero-shuffle digit aggregation
    "q181_decile_gains",        # r8: bucket-partitioned decile rank
    # round 8: device-backed exact order statistics + new families
    "q182_exact_percentiles",   # bucket-rank + 3-row broadcast target join
    "q183_equidepth_histogram",  # bucket-partitioned ntile at FACT grain
    "q184_pmi_collocations",    # vocabulary-granular aggs + top-k
    "q185_ngram_containment",   # q22's capped inverted index, 2 directions
    "q186_temperature_mixture",  # one source-grain agg, decimal normalizer
    "q187_split_leakage",       # q22 pairs + md5-split broadcast joins
    "q188_cohens_kappa",        # zero-shuffle scoring, 1-row confusion agg
    "q189_systematic_sample",   # bucket-rank + per-row modulus filter
    # round 8, second batch
    "q190_roc_auc",             # score-histogram AUC, bounded window
    "q191_heavy_hitters",       # per-partition MG + broadcast semi-join
    "q192_decision_stump",      # value-grain split search
    "q193_readability",         # one zero-join scan to source grain
    "q194_chi_square",          # margin aggs + broadcast grid rebuild
    "q195_attribution",         # user-partitioned LOCF window
    "q196_heldout_perplexity",  # one vocab agg, decimal log-lik sum
    "q197_curation_funnel",     # staged semi/anti joins, shingles once
    "q198_trimmed_mean",        # bucket-rank + one aggregation
    "q199_mann_kendall",        # month-grain local relation, months^2
    "q200_theil_sen",           # same local relation, rank-select median
    "q201_wilson_interval",     # zero-shuffle scoring + source agg
    # round-11 second batch
    "q255_bfs_reachability",    # per-hop frontier join, visited anti-join
    "q256_isotonic_calibration",  # one corpus agg, then 101-row PAV
    "q257_woe_iv",              # two bucket aggs, exact IV fold
    "q258_textrank_keywords",   # tokenize+bigram scan, vocab-grain PR
    "q259_conformal_coverage",  # persisted split passes, value-grain rank
    "q260_intrinsic_dimension",  # 64-probe linear scan, two min-structs
    "q261_periodogram",         # one daily agg, calendar x 10 freqs
    "q262_group_kfold",         # q23 pairs + components + fold aggs
    # round-11 third batch
    "q263_clustering_agreement",  # one agg to contingency grain
    "q264_hodges_lehmann",      # value-domain^2 Walsh pairs
    "q265_bh_fdr",              # one source agg, 20-row windows
    "q266_nelson_aalen",        # user-keyed mins, duration grain
    # round-11 fourth batch
    "q267_idle_balance_blame",  # scalar cutoff + custkey anti join
    "q268_mase_backtest",       # day-grain lags per event type
    "q269_platt_scaling",       # 3 Newton passes over cached grain
    "q270_matching_att",        # count-grain nearest match
    # round-11 fifth batch
    "q271_kruskal_wallis",      # two grain aggs, midrank device
    "q272_cuped_adjustment",    # pruned fact passes, one moment agg
]


def synthesize(spark) -> None:
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1

    def replicate(df, key_cols):
        copies = []
        for i in range(FACTOR):
            c = df
            for k in key_cols:
                c = c.withColumn(k, F.col(k) + F.lit(i * max_ok))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    replicate(li, ["l_orderkey"]).repartition(32).write.mode("overwrite").parquet(
        str(OUT / "lineitem.parquet")
    )
    replicate(orders, ["o_orderkey"]).repartition(32).write.mode(
        "overwrite"
    ).parquet(str(OUT / "orders.parquet"))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    ev_copies = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        .withColumn("user_id", F.col("user_id") + F.lit(i * 100_000))
        for i in range(FACTOR)
    ]
    ev_all = ev_copies[0]
    for c in ev_copies[1:]:
        ev_all = ev_all.unionByName(c)
    ev_all.repartition(32).write.mode("overwrite").parquet(
        str(OUT / "events.parquet")
    )

    # documents: shift ids AND make texts disjoint across copies
    # (per-word copy prefix) so shingle/minhash work grows linearly
    # with the corpus instead of manufacturing 10-way near-dup
    # clusters — the check isolates scaling from duplicate semantics
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    doc_copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_doc))
        .withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"c{i}_$1")
        )
        for i in range(FACTOR)
    ]
    d_all = doc_copies[0]
    for c in doc_copies[1:]:
        d_all = d_all.unionByName(c)
    d_all.repartition(32).write.mode("overwrite").parquet(
        str(OUT / "documents.parquet")
    )

    # embeddings: shifted ids. Default: identical vectors (bucket
    # sizes grow FACTOR-fold — exactly the load ANN candidate
    # generation must absorb linearly, and mostly through the CAPPED
    # star path). SCALE_JITTER=1 (r13, VERDICT r12 task 1) instead
    # perturbs every copy i>0 with deterministic content-hash
    # Gaussian noise (Box-Muller over two xxhash64 uniforms keyed by
    # (vec_id, dim, copy) — reproducible with no RNG state) at two
    # amplitudes: sigma=0.01 for copies 1..FACTOR/2-1 keeps them
    # near-duplicates of the originals (near-ties in neighbor
    # ranking, tight realistic buckets), sigma=0.05 for the rest
    # spreads genuinely novel geometry (vectors are unit-norm, 64-d:
    # expected noise norm = 8*sigma = 0.08 / 0.4). This exercises the
    # UNCAPPED path — realistic bucket distributions, recall under
    # novel geometry — that identical replicas never reach.
    jitter = os.environ.get("SCALE_JITTER", "0") == "1"

    def _gauss(tag: str, amp: float):
        def g(x, i):
            u1 = (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), i, F.lit(tag), F.lit("u1")),
                    F.lit(1_000_000),
                )
                + F.lit(0.5)
            ) / F.lit(1_000_000.0)
            u2 = (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), i, F.lit(tag), F.lit("u2")),
                    F.lit(1_000_000),
                )
                + F.lit(0.5)
            ) / F.lit(1_000_000.0)
            z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(
                F.lit(2.0 * math.pi) * u2
            )
            return (x + F.lit(amp) * z).cast("float")

        return g

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    e_copies = []
    for i in range(FACTOR):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * max_vec))
        if jitter and i > 0:
            amp = 0.01 if i < FACTOR / 2 else 0.05
            c = c.withColumn(
                "embedding",
                F.transform("embedding", _gauss(f"c{i}", amp)),
            )
        e_copies.append(c)
    e_all = e_copies[0]
    for c in e_copies[1:]:
        e_all = e_all.unionByName(c)
    e_all.repartition(32).write.mode("overwrite").parquet(
        str(OUT / "embeddings.parquet")
    )

    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{BASE}/{t}.parquet", OUT / f"{t}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from lynx_spark.plans.analytics import REGISTRY

    out = {}
    reps = int(os.environ.get("SCALE_REPS", "3"))
    # SCALE_ONLY=q109_...,q110_... measures a subset without paying for
    # the full sweep (incremental evidence for newly added operators)
    only = os.environ.get("SCALE_ONLY")
    names = only.split(",") if only else QUERIES
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(min(runs), 3)
    return out


def main() -> None:
    from lynx_spark.session import get_spark

    spark = get_spark("lynx_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark)
    base = time_queries(spark, BASE)
    big = time_queries(spark, str(OUT))
    ratios = {k: round(big[k] / base[k], 2) for k in base}
    print(
        json.dumps(
            {
                "factor": FACTOR,
                "base_sec": base,
                "scaled_sec": big,
                "time_ratio": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
