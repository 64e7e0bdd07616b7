"""Operational store tier for incremental dedup: fingerprints and
minhash signatures persist as parquet; a later batch loads the store
instead of recomputing the seen side, and gets the same answers as the
recompute twin (the driver-oracled q56/q57 shapes)."""

from __future__ import annotations

import pytest

from lynx_spark.operators import dedup as dd

BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different text about spark query engines and columnar formats"),
    (3, "a third document about nothing in particular with many plain words"),
]
BATCH2 = [
    (11, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (12, "the quick brown fox jumps over the lazy dog near the river shore"),  # near dup of 1
    (13, "fresh content that matches nothing previously ingested at all here"),
    (14, "fresh content that matches nothing previously ingested at all here"),  # in-batch dup
]
BATCH3 = [
    (21, "fresh content that matches nothing previously ingested at all here"),  # dup of 13 (batch 2)
    (22, "the quick brown fox jumps over the lazy dog near the river bank"),  # dup of 1 (batch 1)
    (23, "genuinely novel words seen in no earlier batch whatsoever today"),
]


@pytest.fixture()
def batches(spark):
    return tuple(
        spark.createDataFrame(rows, ["doc_id", "text"])
        for rows in (BATCH1, BATCH2, BATCH3)
    )


def test_fingerprint_store_two_batch_flow(spark, batches, tmp_path):
    """Exact tier: batch 1 seeds the store; batch 2 dedups against the
    LOADED store, its survivors append; batch 3 sees both deltas."""
    b1, b2, b3 = batches
    store = str(tmp_path / "fps")

    seed = dd.exact_dedup_groups(b1, "doc_id", "text").select("fingerprint")
    dd.write_fingerprint_store(seed, store, mode="overwrite")

    s2 = dd.incremental_exact_survivors(
        b2, dd.read_fingerprint_store(spark, store), "doc_id", "text"
    )
    got2 = {r["survivor_id"] for r in s2.collect()}
    # 11 dups batch 1; 13/14 collapse in-batch to 13
    assert got2 == {12, 13}

    dd.write_fingerprint_store(s2.select("fingerprint"), store)
    s3 = dd.incremental_exact_survivors(
        b3, dd.read_fingerprint_store(spark, store), "doc_id", "text"
    )
    got3 = {r["survivor_id"] for r in s3.collect()}
    # 21 dups batch 2's survivor, 22 dups batch 1 -> only 23 is new
    assert got3 == {23}
    # store stays duplicate-free across appends
    fps = dd.read_fingerprint_store(spark, store)
    assert fps.count() == fps.distinct().count()


def test_signature_store_matches_recompute_twin(spark, batches, tmp_path):
    """Near-dup tier: batch 2 against the LOADED signature store gives
    the same matches as the recompute twin (q57's shape)."""
    b1, b2, _ = batches
    store = str(tmp_path / "sigs")

    dd.write_signature_store(
        dd.build_signature_store(b1, "doc_id", "text"), store, mode="overwrite"
    )
    from_store = dd.incremental_minhash_matches_from_store(
        b2, dd.read_signature_store(spark, store), "doc_id", "text"
    )
    recompute = dd.incremental_minhash_matches(b2, b1, "doc_id", "text")
    got = sorted(map(tuple, from_store.collect()))
    want = sorted(map(tuple, recompute.collect()))
    assert got == want
    # the exact dup and the near dup of doc 1 are both found
    assert {(a, b) for a, b, _ in got} == {(11, 1), (12, 1)}


def test_signature_store_append_across_batches(spark, batches, tmp_path):
    """Batch 3 matches documents from BOTH earlier deltas after the
    batch-2 signatures are appended."""
    b1, b2, b3 = batches
    store = str(tmp_path / "sigs")

    dd.write_signature_store(
        dd.build_signature_store(b1, "doc_id", "text"), store, mode="overwrite"
    )
    dd.write_signature_store(dd.build_signature_store(b2, "doc_id", "text"), store)
    m3 = dd.incremental_minhash_matches_from_store(
        b3, dd.read_signature_store(spark, store), "doc_id", "text"
    )
    pairs = {(r["new_id"], r["seen_id"]) for r in m3.collect()}
    # 21 near-dups 13 AND 14 (batch 2); 22 near-dups 1 (batch 1) and
    # 11/12 (batch 2's dups of it); 23 matches nothing
    assert (21, 13) in pairs and (21, 14) in pairs
    assert (22, 1) in pairs and (22, 11) in pairs
    assert all(new != 23 for new, _ in pairs)


def test_winnow_store_matches_recompute_twin(spark, batches, tmp_path):
    """Winnow tier (q110's shape): batch 2 against the LOADED
    fingerprint store equals the recompute twin, and appended deltas
    reach batch 3."""
    from lynx_spark.functions import text as tx

    b1, b2, b3 = batches
    store = str(tmp_path / "winnow")

    tx.write_winnow_store(
        tx.build_winnow_store(b1, "doc_id", "text"), store, mode="overwrite"
    )
    from_store = tx.incremental_winnow_matches_from_store(
        b2, tx.read_winnow_store(spark, store), "doc_id", "text"
    )
    recompute = tx.incremental_winnow_matches(b2, b1, "doc_id", "text")
    got = sorted(map(tuple, from_store.collect()))
    assert got == sorted(map(tuple, recompute.collect()))
    # the exact copy and the one-word variant of doc 1 both overlap it
    assert {(a, b) for a, b, _ in got} >= {(11, 1), (12, 1)}

    tx.write_winnow_store(tx.build_winnow_store(b2, "doc_id", "text"), store)
    m3 = tx.incremental_winnow_matches_from_store(
        b3, tx.read_winnow_store(spark, store), "doc_id", "text"
    )
    pairs = {(r["new_id"], r["seen_id"]) for r in m3.collect()}
    # batch 3's copies match seen docs from BOTH deltas (char-gram
    # winnow also surfaces doc 23's shared words — that sensitivity
    # is the operator's point, so assert equality with the recompute
    # twin rather than absence)
    assert (21, 13) in pairs and (22, 1) in pairs and (22, 11) in pairs
    seen_union = b1.unionByName(b2)
    twin3 = tx.incremental_winnow_matches(b3, seen_union, "doc_id", "text")
    assert sorted(map(tuple, m3.collect())) == sorted(
        map(tuple, twin3.collect())
    )
