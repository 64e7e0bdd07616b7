"""Round-11 operator tests.

q125 reshape (VERDICT r10 task 1): the dedup-threshold sweep used to
force-broadcast the near-dup PAIR frame — data-dependent, C(k,2) per
k-copy duplicate cluster, i.e. the exact driver-OOM hazard class the
r10 guards eliminated elsewhere. The reshape broadcasts the 7-row
threshold ROSTER against the pair stream instead and restores empty
thresholds via a roster left-join on the <=7-row aggregate. These
tests pin both regimes: with size-based broadcast disabled, the only
broadcast exchanges left are the three hinted bounded frames (roster,
per-threshold aggregate, 1-row total) — the pair-generating joins
fall back to shuffle joins — and results are identical either way.

q153 (minor r10 finding): the skyline frontier broadcast is un-hinted
(worst case it is distinct-price-sized); the equi-join must fall back
to a shuffle join when size-based broadcast is off, with rows
unchanged.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lynx_spark.plans.analytics import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_auto_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def dup_docs_dir(spark, tmp_path):
    """documents.parquet with two planted near-dup clusters (>=5-word
    shingles shared) plus singletons, so the 0.3 threshold finds
    pairs and tighter thresholds progressively drop them."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = {
        1: base,
        2: base + " today in early spring",
        3: base.replace("lazy", "sleepy"),
        4: "completely unrelated text about spark engines and shuffles here",
        5: "completely unrelated text about spark engines and shuffles now",
        6: "a lone document with no duplicate partner anywhere in sight",
    }
    rows = [(k, v, "en", f"s{k % 2}", len(v)) for k, v in texts.items()]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def test_q125_broadcasts_roster_not_pairs(no_auto_broadcast, dup_docs_dir):
    spark = no_auto_broadcast
    df = REGISTRY["q125_dedup_threshold_sweep"].fn(spark, dup_docs_dir)
    plan = _plan(df)
    # exactly the three hinted bounded frames broadcast; the pair
    # stream and everything upstream of it shuffle-joins
    assert plan.count("BroadcastExchange") == 3
    assert "BroadcastNestedLoopJoin BuildRight, Inner" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    rows = {r["threshold"]: r for r in df.collect()}
    assert len(rows) == 7  # empty thresholds kept by the roster join
    assert rows[0.3]["n_pairs"] > 0
    assert rows[0.9]["n_pairs"] == 0 and rows[0.9]["removed_frac"] == 0.0
    # monotone: tightening the threshold never adds pairs
    ths = sorted(rows)
    for lo, hi in zip(ths, ths[1:]):
        assert rows[lo]["n_pairs"] >= rows[hi]["n_pairs"]


def test_q125_same_rows_with_auto_broadcast(spark, dup_docs_dir):
    df = REGISTRY["q125_dedup_threshold_sweep"].fn(spark, dup_docs_dir)
    rows = sorted(map(tuple, df.collect()))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        again = REGISTRY["q125_dedup_threshold_sweep"].fn(spark, dup_docs_dir)
        assert sorted(map(tuple, again.collect())) == rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q153_frontier_join_unhinted(no_auto_broadcast):
    spark = no_auto_broadcast
    df = REGISTRY["q153_skyline"].fn(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # no forced hint: with size-based broadcast off the frontier join
    # must degrade to a shuffle join, never a BNLJ/cartesian
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n = df.count()
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", "10485760"
    )
    assert REGISTRY["q153_skyline"].fn(
        spark, "/root/testdata/sf0.001"
    ).count() == n
