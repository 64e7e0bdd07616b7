from lynx_spark.operators.dedup import (  # noqa: F401
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingle_table,
    simhash_signatures,
)
from lynx_spark.operators.similarity import (  # noqa: F401
    HYPERPLANES,
    cosine_topk,
    lsh_ann_topk,
)
