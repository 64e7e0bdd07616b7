"""The lazy kNN / IVF-PQ stores must be keyed by DATA, not path: if
the driver regenerates testdata in place (new seed, new scale), a
path-keyed store would silently serve stale edges against a fresh
oracle (VERDICT r7 task 4). The key folds in a fingerprint of the
embeddings parquet footer, so mutating the file under an unchanged
path must move the store and trigger a rebuild."""

from __future__ import annotations

import os
import shutil

from lynx_spark.plans.analytics import _data_fingerprint, _store_path
from lynx_spark.plans.analytics import _knn_edges_stored


SRC = "/root/testdata/sf0.001"


def _copy_testdata(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    for t in ("embeddings",):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), d / f"{t}.parquet")
    return str(d)


def _mutate_embeddings(spark, sf_dir):
    """Regenerate embeddings.parquet in place with fewer rows — the
    driver-regeneration scenario."""
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sample = df.limit(50)
    tmp = os.path.join(sf_dir, "_tmp_emb")
    sample.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(
        os.path.join(tmp, part),
        os.path.join(sf_dir, "embeddings.parquet"),
    )
    shutil.rmtree(tmp)


def test_fingerprint_changes_when_data_changes(spark, tmp_path):
    d = _copy_testdata(tmp_path)
    fp_before = _data_fingerprint(d)
    path_before = _store_path(d, "knn_k5")
    _mutate_embeddings(spark, d)
    assert _data_fingerprint(d) != fp_before
    assert _store_path(d, "knn_k5") != path_before


def test_store_rebuilds_after_in_place_regeneration(spark, tmp_path):
    d = _copy_testdata(tmp_path)
    edges_before = _knn_edges_stored(spark, d, k=5)
    n_before = edges_before.count()
    store_before = _store_path(d, "knn_k5")
    assert os.path.exists(os.path.join(store_before, "_SUCCESS"))

    _mutate_embeddings(spark, d)
    edges_after = _knn_edges_stored(spark, d, k=5)
    store_after = _store_path(d, "knn_k5")
    # new key → new store directory → fresh build over the new data,
    # never the stale edge list
    assert store_after != store_before
    assert os.path.exists(os.path.join(store_after, "_SUCCESS"))
    assert edges_after.count() == 50 * 5 != n_before
