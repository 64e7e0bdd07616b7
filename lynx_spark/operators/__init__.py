from lynx_spark.operators.dedup import (  # noqa: F401
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingle_table,
    simhash_signatures,
)
from lynx_spark.operators.dedup import (  # noqa: F401
    bloom_prefiltered_survivors,
    build_fingerprint_bloom,
    incremental_exact_survivors,
    lsh_recall_audit,
)
from lynx_spark.operators.similarity import (  # noqa: F401
    HYPERPLANES,
    ann_recall_audit,
    cosine_topk,
    dimension_stats,
    hard_negatives,
    ivf_ann_topk,
    ivfpq_ann_topk,
    jl_distortion_audit,
    jl_project,
    knn_graph,
    load_ivf_index,
    lsh_ann_topk,
    pca_whiten,
    pq_audit,
    pq_train_codebooks,
    quantization_audit,
    query_ann_store,
    save_ivf_index,
    semdedup_pairs,
    write_ann_store,
)
from lynx_spark.operators.corpus import (  # noqa: F401
    chunk_documents,
    corpus_checksum,
    curriculum_interleave,
    export_balanced_shards,
    materialize_mixture,
    ngram_novelty,
    pack_efficiency,
    pack_materialize,
    pack_sequences,
    pps_sample,
    repetition_plan,
    source_overlap_matrix,
    token_budget_select,
)
from lynx_spark.operators.graph import (  # noqa: F401
    pagerank,
)
from lynx_spark.operators.lm import (  # noqa: F401
    bm25_topk,
    nb_langid_confusion,
    rrf_fuse,
    tfidf_top_terms,
    train_logreg,
    unigram_scores,
)
from lynx_spark.operators.quality import (  # noqa: F401
    category_drift_psi,
    classifier_eval_curve,
    classifier_scores,
    countmin_audit,
    feature_correlations,
    gopher_rules,
    hll_audit,
    language_mix,
    numeric_drift_ks,
    profile_columns,
    word_entropy,
)
