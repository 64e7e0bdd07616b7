"""Connected-components / dedup-cluster resolution tests."""

import random

import pytest

from lynx_spark.operators import graph as gr


def _cc(spark, vertex_ids, edge_pairs, **kw):
    verts = spark.createDataFrame([(v,) for v in vertex_ids], ["id"])
    edges = spark.createDataFrame(edge_pairs, "a_id: long, b_id: long")
    out = gr.connected_components(verts, edges, "id", **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def _union_find(vertex_ids, edge_pairs):
    parent = {v: v for v in vertex_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min id per component
    comp = {}
    for v in vertex_ids:
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


def test_chain_propagates_min_across_diameter(spark):
    """1-2-3-4-5 chain: min label must travel 4 hops."""
    got = _cc(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_singletons(spark):
    got = _cc(
        spark,
        [1, 2, 3, 10, 11, 20],
        [(2, 3), (1, 3), (10, 11)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_empty_edges_all_singletons(spark):
    got = _cc(spark, [5, 6, 7], [])
    assert got == {5: 5, 6: 6, 7: 7}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(20240813)
    verts = list(range(60))
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _cc(spark, verts, edges) == _union_find(verts, edges)


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [1, 2, 3], [(1, 2), (2, 3)], max_iter=1)


def test_dedup_corpus_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 4)], ["a_id", "b_id"]
    )
    out = {
        r["survivor_id"]: r["cluster_size"]
        for r in gr.dedup_corpus_survivors(docs, pairs).collect()
    }
    assert out == {0: 3, 1: 2, 2: 1}
