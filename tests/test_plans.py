"""Physical-plan regression guard: pins the load-bearing claims of
PLANS.md so a silent plan regression (a broadcast decaying to a
shuffle join, a pushed filter lifting off the scan, a zero-shuffle
operator growing an exchange) fails CI instead of surfacing as a
bench slowdown three rounds later. Plans are inspected at sf0.001 —
the PROPERTIES asserted (join strategy, exchange count, pushdown)
are scale-free; only the AQE broadcast/SMJ flip is size-dependent,
and these queries' build sides are dimension/model-sized by design.
"""

from __future__ import annotations

import pytest

from lynx_spark.plans.analytics import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return (
        REGISTRY[name]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q03_double_broadcast_with_pushdown(spark):
    plan = plan_of(spark, "q03_shipping_priority")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_q01_pushdown_no_join(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "Join" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q05_all_broadcast(spark):
    plan = plan_of(spark, "q05_region_revenue")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_q42_raw_ns_predicate_pushed(spark):
    # the ts bound must reach the scan as a raw-nanosecond long, not
    # the derived µs column (which would block pushdown)
    plan = plan_of(spark, "q42_downsample")
    assert "LessThan(ts," in plan


def test_zero_shuffle_row_local_operators(spark):
    for name in ("q63_pii_scrub", "q69_gopher_filter"):
        plan = plan_of(spark, name)
        assert "Exchange" not in plan, name
        assert "Join" not in plan, name


def test_q73_single_domain_exchange_with_group_limit(spark):
    plan = plan_of(spark, "q73_domain_sample")
    assert plan.count("Exchange hashpartitioning") == 1
    # rn<=budget fuses into WindowGroupLimit: map tasks ship only
    # their per-domain top rows through the one exchange
    assert "WindowGroupLimit" in plan


def test_q24_deliberate_broadcast_nested_loop(spark):
    # the brute-force cosine baseline broadcasts the query side; a
    # CartesianProduct here would mean the broadcast hint was lost
    plan = plan_of(spark, "q24_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q21_dedup_exact",
        "q22_ngram_jaccard",
        "q23_minhash_lsh",
        "q83_knn_graph",
        "q110_incremental_winnow",
    ],
)
def test_no_cartesian_products_in_dedup_family(spark, name):
    # candidate generation is equality-join/window shaped everywhere;
    # an accidental cross join is the classic quadratic regression
    assert "CartesianProduct" not in plan_of(spark, name), name


def test_q171_window_group_limit(spark):
    # the per-stratum rank<=10 must fuse into WindowGroupLimit so map
    # tasks ship only their per-source top rows; a plain Window here
    # means every row crosses the exchange
    plan = plan_of(spark, "q171_stratified_wor")
    assert "WindowGroupLimit" in plan
    assert "SinglePartition" not in plan


def test_q172_block_partitioned_rank_no_cartesian(spark):
    # SNM's rank window must partition by the block (a global
    # row_number would collapse the corpus to one partition), and
    # candidate generation is (blk, rnk) equi-join shaped
    plan = plan_of(spark, "q172_sorted_neighborhood")
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name", ["q170_prefix_filter_join", "q173_fuzzy_name_match"]
)
def test_new_join_family_no_cartesian(spark, name):
    # prefix-filter and blocked-Levenshtein candidates are pure
    # equality joins; a cross join is the quadratic regression
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q174_single_partition_only_on_frequency_table(spark):
    # the skew audit's one SinglePartition exchange sits above the
    # key-frequency aggregate (cardinality-sized), never the scan:
    # exactly one per audited column, plus the two 1-row final aggs
    plan = plan_of(spark, "q174_key_skew_audit")
    assert plan.count("Exchange SinglePartition") <= 4
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    ["q175_link_prediction", "q176_basket_rules"],
)
def test_topk_batch5_takeordered_no_cartesian(spark, name):
    # link prediction and basket rules end in top-k: partial
    # per-partition top-k (TakeOrderedAndProject), never a global
    # sort, and every candidate join is key-equality
    plan = plan_of(spark, name)
    assert plan.count("TakeOrderedAndProject") == 1, name
    assert "CartesianProduct" not in plan, name


def test_q177_single_fact_exchange(spark):
    # RFM: exactly one data-sized exchange (the custkey aggregation);
    # the ntile windows run over the customer aggregate only
    plan = plan_of(spark, "q177_rfm_segments")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_q179_window_over_part_grain(spark):
    # ABC: the cumulative window sits above the part aggregate
    # (dimension-cardinality); the fact side contributes exactly one
    # hash exchange (partkey agg) before it
    plan = plan_of(spark, "q179_pareto_abc")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan


def test_q180_digit_dim_broadcast(spark):
    # Benford: the 9-row digit dimension joins broadcast; the fact
    # side is one zero-join aggregation
    plan = plan_of(spark, "q180_benford_audit")
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q181_single_fact_exchange(spark):
    # decile gains: the classifier scores are zero-shuffle per-row
    # expressions, so the only data-sized exchange is the doc_id
    # score/label join; the decile and cumulative windows run over
    # the scored corpus and the 10-row decile frame
    plan = plan_of(spark, "q181_decile_gains")
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") <= 1
