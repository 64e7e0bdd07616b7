"""Connected components — dedup-cluster resolution.

The dedup operators (q22/q23/q30/q37) emit near-duplicate PAIRS; what
a curation pipeline actually needs is the partition of the corpus into
duplicate CLUSTERS (connected components of the pair graph) and one
survivor per cluster. The reference engine has no graph surface; this
is a BASELINE.json north-star extension.

Algorithm: min-label propagation to fixpoint — every vertex starts
labeled with its own id; each round, every vertex takes the minimum
label among itself and its neighbors; at fixpoint the label is the
minimum vertex id of the component (the canonical cluster id, the same
convention the star-pattern pair capping already uses). Each round is
ONE shuffle: a join of the symmetrized edge list against the current
labels on the edge source, then a min-aggregation over the
destination. Rounds needed = graph diameter, which for dedup graphs
is small by construction: LSH bucket pairs form near-cliques, and the
``max_bucket`` star fallback links members directly to the bucket
minimum (diameter <= 2 per bucket, so a handful of rounds even across
chained buckets). For adversarial long-chain graphs the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond") converges in O(log n) rounds with the same
join-per-round shape; the propagation loop below is the right
trade-off for dedup workloads and keeps every round a plain
key-equality join Catalyst can plan.

Convergence detection without a compare-join: labels only ever
DECREASE, so the fixpoint is reached exactly when sum(labels) stops
changing — one scalar aggregate per round (summed as DECIMAL(38,0) so
a 10^12-vertex corpus cannot overflow the check). Per-round results
are persisted and the previous round unpersisted; on a real cluster
the driver loop is the standard iterative-algorithm shape (GraphX/
GraphFrames do the same), with periodic checkpointing to truncate
lineage — here rounds are few and each round's cache bounds
recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: propagation-round guard; diameter of dedup pair graphs is tiny, so
#: hitting this indicates a pathological chain (raise, don't return a
#: silently-unconverged labeling)
MAX_CC_ITERS = 30


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "a_id",
    dst_col: str = "b_id",
    max_iter: int = MAX_CC_ITERS,
) -> DataFrame:
    """(id, component) for every vertex; ``component`` is the minimum
    vertex id in the vertex's connected component (vertices absent
    from ``edges`` form singleton components labeled by themselves).

    ``vertices`` needs an ``id_col`` column; ``edges`` is undirected —
    each (src, dst) row links both ways."""
    labels = vertices.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(id_col).cast("long").alias("component"),
    ).persist()
    prev_sum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]

    e = (
        edges.select(
            F.col(src_col).cast("long").alias("s"),
            F.col(dst_col).cast("long").alias("d"),
        )
        .unionByName(
            edges.select(
                F.col(dst_col).cast("long").alias("s"),
                F.col(src_col).cast("long").alias("d"),
            )
        )
        .persist()
    )

    for _ in range(max_iter):
        # neighbor labels flow along edges; a vertex keeps the min of
        # its own label and everything received — one shuffle on id.
        # localCheckpoint truncates the round's lineage: without it the
        # logical plan doubles every round and Catalyst re-analyzes the
        # whole history each iteration (on a production cluster with
        # executor loss concerns this would be a reliable checkpoint to
        # storage — same call shape, GraphFrames does exactly this)
        msgs = e.join(
            labels.withColumnRenamed("id", "s"), "s"
        ).select(F.col("d").alias("id"), "component")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:  # labels are monotone non-increasing
            e.unpersist()
            return labels
        prev_sum = new_sum
    e.unpersist()
    labels.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological chain graph; raise max_iter or switch to the "
        "large-star/small-star variant"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "a_id",
    dst_col: str = "b_id",
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: near-dup pairs become
    connected components; documents in no pair are their own cluster.
    cluster_id = the minimum doc id of the cluster — the survivor
    under keep-first semantics."""
    cc = connected_components(docs, pairs, id_col, src_col, dst_col)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def dedup_corpus_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per duplicate cluster: the surviving document id plus
    the cluster size — the materialized output of near-dedup (filter
    the corpus to ``survivor_id`` to get the deduplicated dataset).
    Cluster sizes come from one count over the cluster assignment."""
    clusters = dedup_clusters(docs, pairs, id_col)
    return clusters.groupBy(F.col("cluster_id").alias("survivor_id")).agg(
        F.count("*").alias("cluster_size")
    )
