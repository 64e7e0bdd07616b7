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


def live_plan(plan: str) -> str:
    """The plan restricted to what actually EXECUTES: explain renders
    each InMemoryRelation's cached plan nested beneath it (the recipe
    Spark would replay only on cache eviction), so node counts over
    the raw string double-count work that the run reads from
    InMemoryTableScan. Drop every line strictly deeper-indented than
    an InMemoryRelation ancestor."""
    out: list[str] = []
    skip_depth: int | None = None
    for line in plan.splitlines():
        # depth = leading tree-gutter width (spaces and `:` branch
        # continuations). Do NOT strip `+-`: innerChildren (cached
        # plans, AQE stage sections) render their text at the same
        # first-letter column as the parent's `+- ` label, and only
        # the gutter distinguishes them
        depth = len(line) - len(line.lstrip(" :|"))
        if skip_depth is not None:
            if depth > skip_depth:
                continue
            # an executed cache renders `== Final Plan ==` /
            # `== Initial Plan ==` section headers at the relation's
            # own depth — still part of the cached rendering (the
            # top-level plan is pre-execution, isFinalPlan=false,
            # and never emits these)
            if "== Final Plan ==" in line or "== Initial Plan ==" in line:
                skip_depth = depth
                continue
            skip_depth = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_depth = depth
    return "\n".join(out)


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


@pytest.mark.parametrize(
    "name", ["q170_prefix_filter_join", "q157_modularity"]
)
def test_guarded_broadcast_still_hints_when_small(spark, name):
    # r10: the two formerly-forced broadcast hints are now gated on a
    # counted row total (broadcast_if_counted). At test SF the counts
    # are tiny, so the hint MUST still be applied — losing it here
    # means the guard broke the fast path, not just the safety
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan, name


def test_q160_single_scan_no_join(spark):
    # r10 reshape: endpoints by explode (not a union that derives iv
    # twice) and n_users folded into the post-sweep day aggregation —
    # one events scan, two exchanges (interval groupBy + day window),
    # zero joins. A third exchange or a reappearing join means the
    # old double-derivation came back
    plan = plan_of(spark, "q160_peak_concurrency")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 2
    assert "Join" not in plan


def test_q216_domain_bounded_windows(spark):
    # the sketch audit's two global cum windows run at grid-histogram
    # grain (domain-bounded) and 64-bucket grain — never fact grain:
    # exactly one parquet scan feeds the persisted histogram, the two
    # SinglePartition exchanges sit ABOVE the gv aggregation, and the
    # 5-row pct frame joins as broadcast (BNLJ on the range filter)
    plan = plan_of(spark, "q216_quantile_sketch_audit")
    live = live_plan(plan)
    # the raw plan re-renders the cached histogram recipe (and its
    # parquet scan) under every InMemoryRelation reference; what
    # EXECUTES reads the cache
    assert "Scan parquet" not in live
    assert live.count("Exchange SinglePartition") <= 2
    assert "CartesianProduct" not in plan


def test_q174_fof_grain_no_key_rank(spark):
    # r8: the Gini numerator computes on the frequency-of-frequencies
    # histogram — no rank window over the key table at all. The two
    # SinglePartition exchanges sit above the fof aggregates
    # (heavy-tail-bounded), and no row_number survives anywhere
    plan = plan_of(spark, "q174_key_skew_audit")
    assert plan.count("Exchange SinglePartition") <= 2
    assert "row_number" not in plan
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


def test_q177_distributed_ntile(spark):
    # RFM (r8; r9 persist_input; r10 multi-spec device): all three
    # quintile scores come from ONE global_ntile_multi call — the
    # LIVE plan (cached subtrees stripped) is exactly three pipelined
    # bucket windows over ONE InMemoryTableScan of the bucketed
    # customer frame; no ntile, no SinglePartition, no parquet re-scan
    plan = plan_of(spark, "q177_rfm_segments")
    assert "ntile(" not in plan
    live = live_plan(plan)
    assert live.count("row_number") == 3
    for i in range(3):
        assert live.count(f"windowspecdefinition(_bkt{i}") == 1
    assert live.count("InMemoryTableScan") == 1
    assert live.count("Exchange SinglePartition") == 0
    assert "Scan parquet" not in live
    assert "CartesianProduct" not in plan


def test_q179_distributed_running_sum(spark):
    # ABC (r8): the cumulative revenue is the two-phase running sum —
    # the sum window is partitioned by the bucket id, never
    # SinglePartition over the part frame (parts scale linearly)
    plan = plan_of(spark, "q179_pareto_abc")
    assert plan.count("windowspecdefinition(_bkt") == 1
    assert plan.count("Exchange SinglePartition") <= 1
    assert "CartesianProduct" not in plan


def test_q180_digit_dim_broadcast(spark):
    # Benford: the 9-row digit dimension joins broadcast; the fact
    # side is one zero-join aggregation
    plan = plan_of(spark, "q180_benford_audit")
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q181_distributed_decile(spark):
    # decile gains (r8; r9 persist_input + local relation): the
    # decile comes from the two-phase breakpoint rank over the
    # PERSISTED scored⋈labeled frame (classifier scoring ran 3x
    # unpersisted — SCALE.md's 2.18 ratio), and the ≤10-row decile
    # frame collects to a VALUES literal, so the returned plan is
    # driver-local: no parquet scan, no parallelize-backed
    # ExistingRDD, no fact-sized window at all — that ran exactly
    # once at build time
    plan = plan_of(spark, "q181_decile_gains")
    assert "ntile(" not in plan
    assert "Scan parquet" not in plan
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_q178_single_fact_scan_day_grain_joins(spark):
    # ACF (r8, r9 retrofit): the calendar-bounded day frame is
    # collected once (the single fact pass runs eagerly at build
    # time), so the returned plan contains NO parquet scan at all —
    # every non-equi (lag-range) join runs over the local day
    # relation; lazily re-derived, the events scan ran 7x (one
    # 100 TB pass each). r9: the local relation is a VALUES literal
    # (LocalTableScan), NOT a parallelize-backed ExistingRDD that
    # pays a python-worker round trip per evaluation — the lag
    # self-join evaluates it twice per pass
    plan = plan_of(spark, "q178_acf")
    assert "Scan parquet" not in plan
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_single_partition_window_over_data_frames(spark):
    # the r8 invariant the VERDICT asked to pin: across the four
    # rewritten queries, NO window function runs behind an Exchange
    # SinglePartition over a data-sized frame — every row_number/sum
    # window over corpus/dimension grain is partitioned by _bkt, and
    # ntile is gone entirely (closed-form tile from rank + totals)
    for name in (
        "q174_key_skew_audit",
        "q177_rfm_segments",
        "q179_pareto_abc",
        "q181_decile_gains",
    ):
        plan = plan_of(spark, name)
        assert "ntile(" not in plan, name
        for line in plan.splitlines():
            if "windowspecdefinition" in line and (
                "row_number" in line or "sum(" in line
            ):
                # windows are either bucket-partitioned (data-sized,
                # parallel) or ordered by fof/decile grain (bounded)
                assert (
                    "windowspecdefinition(_bkt" in line
                    or "windowspecdefinition(f#" in line
                    or "windowspecdefinition(decile#" in line
                ), f"{name}: unexpected window shape: {line.strip()}"


@pytest.mark.parametrize(
    "name",
    [
        "q182_exact_percentiles",
        "q183_equidepth_histogram",
        "q189_systematic_sample",
    ],
)
def test_r8_device_fact_grain_queries(spark, name):
    # r8: exact order statistics over FACT-sized frames through the
    # two-phase ranking device — one bucket-partitioned window, zero
    # SinglePartition exchanges, no ntile anywhere
    plan = plan_of(spark, name)
    assert plan.count("Exchange SinglePartition") == 0, name
    assert plan.count("windowspecdefinition(_bkt") == 1, name
    assert "ntile(" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_q184_pmi_topk_no_global_sort(spark):
    # PMI: vocabulary-granular aggs, top-50 via TakeOrderedAndProject
    # (partial per-partition top-k); the SinglePartition exchanges are
    # the two scalar totals only
    plan = plan_of(spark, "q184_pmi_collocations")
    assert plan.count("TakeOrderedAndProject") == 1
    assert plan.count("Exchange SinglePartition") <= 2
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["q185_ngram_containment", "q187_split_leakage"]
)
def test_r8_invertedindex_family_no_cartesian(spark, name):
    # containment / leakage ride the q22 df-capped inverted index:
    # key-equality joins only, zero SinglePartition over the corpus
    plan = plan_of(spark, name)
    assert plan.count("Exchange SinglePartition") == 0, name
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q188_zero_shuffle_scoring(spark):
    # kappa: per-row classifier scoring + doc_id join + one 1-row
    # confusion aggregate — no data-sized hash exchange at all
    plan = plan_of(spark, "q188_cohens_kappa")
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange SinglePartition") <= 1
    assert "CartesianProduct" not in plan


def test_q190_auc_histogram_form(spark):
    # AUC (r8): the only window runs over the SCORE-VALUE grain
    # (quality_prob on a 1e-4 grid — bounded at 10001 rows), never a
    # rank over the corpus; the fact-sized work is one hash exchange
    # (the score histogram) and a broadcast doc_id join
    plan = plan_of(spark, "q190_roc_auc")
    assert plan.count("Exchange SinglePartition") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    wins = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert len(wins) == 1 and "windowspecdefinition(p#" in wins[0]


def test_q191_two_pass_mg_shape(spark):
    # heavy hitters (r8): pass 1 is the per-partition Misra-Gries
    # summary (one MapInPandas, zero shuffle before it); candidates
    # join back broadcast LEFT-SEMI; NO SinglePartition anywhere —
    # the vocabulary-sized groupBy the oracle runs never happens
    plan = plan_of(spark, "q191_heavy_hitters")
    assert plan.count("MapInPandas") == 1
    assert "LeftSemi" in plan and plan.count("BroadcastHashJoin") == 1
    assert plan.count("Exchange SinglePartition") == 0
    assert "SortMergeJoin" not in plan


def test_q192_value_grain_split_search(spark):
    # stump (r8): cumulative class counts window over the FEATURE-
    # VALUE grain (distinct n_chars — bounded domain), broadcast
    # totals, argmin via TakeOrderedAndProject — never a global sort
    plan = plan_of(spark, "q192_decision_stump")
    assert plan.count("TakeOrderedAndProject") == 1
    assert plan.count("Exchange SinglePartition") <= 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    wins = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert len(wins) == 1  # nl and lp share one value-grain Window op
    assert "windowspecdefinition(x#" in wins[0]
    assert wins[0].count("sum(") == 2


def test_q193_zero_join_single_exchange(spark):
    # readability: three regexp counts fold into ONE scan + one
    # source-grain exchange; no join of any kind
    plan = plan_of(spark, "q193_readability")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 0


def test_q194_broadcast_grid_single_scan(spark):
    # chi-square: the corpus is scanned exactly ONCE at build time
    # (the cell aggregation, collected dimension-sized — the q178
    # device); the returned plan reads only the local cell relation,
    # so margins/totals can never re-scan 100 TB
    plan = plan_of(spark, "q194_chi_square")
    assert "Scan parquet" not in plan
    assert "LocalTableScan" in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_q195_user_partitioned_window(spark):
    # attribution: the LOCF window is PARTITIONED BY user_id
    # (hashpartitioning, parallel) — never a global window; zero
    # SinglePartition exchanges
    plan = plan_of(spark, "q195_attribution")
    assert plan.count("Exchange SinglePartition") == 0
    wins = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert len(wins) == 1 and "windowspecdefinition(user_id#" in wins[0]
    assert "Join" not in plan


def test_q196_single_scan_single_agg(spark):
    # held-out perplexity: the ln(c+1)/ln(N+V) decomposition makes
    # the whole statistic ONE corpus scan -> ONE vocabulary exchange
    # -> ONE scalar reduction; a naive ln(a/b) form needs the totals
    # before the per-word pass and scans the corpus twice
    plan = plan_of(spark, "q196_heldout_perplexity")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    assert "Join" not in plan


def test_q197_one_funnel_aggregation(spark):
    # curation funnel: per-stage survival is FLAGS on one persisted
    # narrow frame; the funnel is ONE aggregation unpivoted by stack
    # — never one aggregation job per stage (the first draft's plan
    # re-derived the flag frame per stage: 21 parquet scans)
    plan = plan_of(spark, "q197_curation_funnel")
    assert plan.count("Exchange SinglePartition") == 1
    assert "InMemoryTableScan" in plan  # the shared flag frame
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q198_device_trim(spark):
    # trimmed mean: ranks from the bucket-partitioned device, trim
    # bounds are literals, ONE aggregation over the ranked frame
    plan = plan_of(spark, "q198_trimmed_mean")
    assert plan.count("windowspecdefinition(_bkt") == 1
    assert plan.count("Exchange SinglePartition") == 1  # final 1-row agg
    assert "ntile(" not in plan
    assert "Join" not in plan


@pytest.mark.parametrize(
    "name", ["q199_mann_kendall", "q200_theil_sen"]
)
def test_trend_stats_local_relation_only(spark, name):
    # Mann-Kendall / Theil-Sen (r8): the ONE fact scan runs at build
    # time (month-grain collect, the q178 device); the returned plan
    # reads only the 80-row month VALUES literal (LocalTableScan —
    # NOT a parallelize-backed ExistingRDD, which costs a python
    # round trip per evaluation) — its pairwise non-equi joins are
    # months^2 by construction (calendar-bounded, grows with years,
    # never with data volume)
    plan = plan_of(spark, name)
    assert "Scan parquet" not in plan, name
    assert "LocalTableScan" in plan, name
    assert "Scan ExistingRDD" not in plan, name


def test_q201_wilson_shape(spark):
    # Wilson intervals: zero-shuffle per-row scoring, one broadcast
    # doc_id join, one source-grain exchange — no SinglePartition,
    # no sort-merge anywhere
    plan = plan_of(spark, "q201_wilson_interval")
    assert plan.count("Exchange SinglePartition") == 0
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# ===================== round 9 pins =====================


def test_r9_device_inequality_queries(spark):
    # q205/q212: Gini and Zipf rank via the two-phase device with
    # persist_input — the LIVE plan is one bucket window over one
    # InMemoryTableScan; the only SinglePartition is the final
    # model-sized moment aggregation
    for name in ("q205_gini_concentration", "q212_zipf_slope"):
        live = live_plan(plan_of(spark, name))
        assert live.count("windowspecdefinition(_bkt") == 1, name
        assert live.count("InMemoryTableScan") == 1, name
        assert live.count("Exchange SinglePartition") <= 1, name
        assert "Scan parquet" not in live, name
        assert "ntile(" not in live, name
        assert "CartesianProduct" not in live, name


def test_r9_local_relation_queries(spark):
    # q206/q208/q210/q211: calendar- or decile-bounded frames collect
    # to VALUES literals — the returned plan reads LocalTableScan
    # only (never a parquet re-scan, never a parallelize-backed
    # ExistingRDD that pays a python round trip per evaluation)
    for name in (
        "q206_lorenz_deciles",
        "q208_kendall_tau",
        "q210_cohort_retention",
        "q211_dow_seasonality",
    ):
        plan = plan_of(spark, name)
        live = live_plan(plan)
        assert "LocalTableScan" in live, name
        assert "Scan parquet" not in live, name
        assert "Scan ExistingRDD" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_r9_score_grid_eval_queries(spark):
    # q203/q204: the PR curve and KS run entirely on the PERSISTED
    # bounded score-grid frame — the returned plan reads
    # InMemoryTableScan (two consumers, one materialization), its
    # SinglePartition exchanges sit only above the <=10001-row grid,
    # and no parquet scan survives in the live plan
    for name in ("q203_pr_curve", "q204_ks_statistic"):
        live = live_plan(plan_of(spark, name))
        assert live.count("InMemoryTableScan") == 2, name
        assert "Scan parquet" not in live, name
        assert live.count("Exchange SinglePartition") <= 2, name
        assert "CartesianProduct" not in live, name


def test_r9_partitioned_window_queries(spark):
    # q214/q215: every data-sized window is PARTITIONED (user_id /
    # source) — the gaps-and-islands detector and the grouped
    # percentile histogram never plan a global window; the one
    # SinglePartition allowed is q214's final single-row aggregate
    for name, part in (
        ("q214_interval_islands", "windowspecdefinition(user_id"),
        ("q215_source_percentile_bands", "windowspecdefinition(source"),
    ):
        plan = plan_of(spark, name)
        assert plan.count(part) == 2, name
        for line in plan.splitlines():
            if "windowspecdefinition" in line:
                assert part in line, f"{name}: {line.strip()[:100]}"
        assert plan.count("Exchange SinglePartition") <= 1, name
        assert plan.count("Scan parquet") == 1, name
        assert "CartesianProduct" not in plan, name


def test_r9_single_scan_aggregates(spark):
    # q202/q213: one aggregation pipeline, no windows over data;
    # q202's only join is the broadcast label join at doc grain
    plan = plan_of(spark, "q213_dup_cluster_powerlaw")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan
    plan = plan_of(spark, "q202_calibration_bins")
    assert plan.count("Scan parquet") == 2  # scores + labels (q190 shape)
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_r9_shared_frame_queries(spark):
    # q207/q209/q217: a persisted shared frame feeds every marginal
    # consumer (bigram table -> 3 marginals + filter; doc frame -> 2
    # midrank maps + fact pass; source x lang grid -> margins/total/
    # cells) — the live plan reads InMemoryTableScan, and the only
    # parquet scans left are cache materialization, not re-derivation
    for name, n_cache in (
        ("q207_gtest_collocations", 4),
        ("q209_spearman_rank_corr", 3),
        ("q217_js_divergence", 4),
    ):
        live = live_plan(plan_of(spark, name))
        assert live.count("InMemoryTableScan") == n_cache, name
        assert "Scan parquet" not in live, name
        assert "CartesianProduct" not in live, name
    # q207's top-50 is a partial top-k, never a global sort
    assert "TakeOrderedAndProject" in plan_of(spark, "q207_gtest_collocations")


# ===================== round 9, second batch =====================


def test_q218_km_partitioned_fact_window(spark):
    # the only data-sized window is custkey-PARTITIONED; the global
    # max date is a second column-pruned scan (map-side agg), never a
    # whole-frame window over fact grain; every SinglePartition sits
    # above the calendar-bounded duration grain (<= span-in-days rows)
    plan = plan_of(spark, "q218_kaplan_meier")
    assert plan.count("Scan parquet") == 2
    assert plan.count("windowspecdefinition(o_custkey") >= 1
    assert plan.count("Exchange SinglePartition") <= 2
    assert plan.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q219_changepoint_local_relation_only(spark):
    # the month frame embeds as a VALUES literal: the returned plan
    # is windows over a LocalTableScan — zero parquet, zero
    # python-backed ExistingRDD
    plan = plan_of(spark, "q219_changepoint")
    live = live_plan(plan)
    assert "LocalTableScan" in live
    assert "Scan parquet" not in live
    assert "Scan ExistingRDD" not in plan
    assert plan.count("Exchange SinglePartition") <= 1
    assert "CartesianProduct" not in plan


def test_q220_lexical_diversity_one_scan_no_singlepartition(spark):
    # two stacked vocabulary-grain aggregations off ONE corpus scan;
    # fully parallel — no window, no join, no SinglePartition anywhere
    plan = plan_of(spark, "q220_lexical_diversity")
    assert plan.count("Scan parquet") == 1
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition" not in plan
    assert "Join" not in plan


def test_q221_cramers_v_shared_grid(spark):
    # the bounded segment x nation grid persists once and feeds all
    # four consumers (row marginals, col marginals, total, cells) —
    # live plan reads InMemoryTableScan x4, no parquet re-scan; the
    # two SinglePartition exchanges sit above grid-sized frames
    live = live_plan(plan_of(spark, "q221_cramers_v"))
    assert live.count("InMemoryTableScan") == 4
    assert "Scan parquet" not in live
    assert live.count("Exchange SinglePartition") <= 2
    assert "SortMergeJoin" not in live
    assert "CartesianProduct" not in live


def test_q222_neyman_broadcast_strata(spark):
    # orders joins customer and nation by BROADCAST (dimension
    # sides), strata aggregate behind one hashpartitioning, and the
    # apportionment windows run over the nations-sized frame behind
    # at most one SinglePartition
    plan = plan_of(spark, "q222_neyman_allocation")
    assert plan.count("Scan parquet") == 3
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange SinglePartition") <= 1
    assert plan.count("windowspecdefinition(rem") >= 1


def test_q223_single_scan_pushed_filter(spark):
    # one column-pruned scan with the priority disjunction PUSHED to
    # parquet; both groups' moments come from ONE conditional
    # aggregation (no join, no second scan); the only SinglePartition
    # is the final single-row reduce
    plan = plan_of(spark, "q223_welch_ttest")
    assert plan.count("Scan parquet") == 1
    assert (
        "PushedFilters: [Or(EqualTo(o_orderpriority,1-URGENT),"
        "EqualTo(o_orderpriority,5-LOW))]" in plan
    )
    assert "ReadSchema: struct<o_totalprice:double,o_orderpriority:string>" in plan
    assert "Join" not in plan
    assert plan.count("Exchange SinglePartition") == 1


def test_q224_q226_month_literal_only(spark):
    # runs test and Durbin-Watson run entirely on the month VALUES
    # literal (two free re-evaluations); every window/aggregate is
    # months-sized — no parquet, no python-backed ExistingRDD
    for name in ("q224_runs_test", "q226_durbin_watson"):
        plan = plan_of(spark, name)
        live = live_plan(plan)
        assert "LocalTableScan" in live, name
        assert "Scan parquet" not in live, name
        assert "Scan ExistingRDD" not in plan, name
        assert plan.count("Exchange SinglePartition") <= 2, name
        assert "CartesianProduct" not in plan, name


def test_q225_hhi_broadcast_no_singlepartition(spark):
    # supplier and nation dims broadcast; revenue aggregates
    # supplier-grain then nation-grain behind two hashpartitionings;
    # NO SinglePartition anywhere (per-nation output stays grouped)
    plan = plan_of(spark, "q225_hhi_concentration")
    assert plan.count("Scan parquet") == 3
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition" not in plan


def test_q227_source_cosine_shared_vocab_frame(spark):
    # the (source, word) frame persists once and feeds all four cache
    # reads (norms twice via x/y, both self-join sides); live plan
    # reads InMemoryTableScan only — the corpus is scanned exactly
    # once, at cache materialization
    live = live_plan(plan_of(spark, "q227_source_profile_cosine"))
    assert live.count("InMemoryTableScan") == 4
    assert "Scan parquet" not in live
    assert "CartesianProduct" not in live
    assert "Exchange SinglePartition" not in live


R10_COHORT = [
    "q229_psi_drift",
    "q230_ohlc_bars",
    "q232_anova_f",
    "q234_ccf_lagged",
    "q236_info_gain",
    "q239_bootstrap_ci",
    "q242_source_vocab_jaccard",
    "q243_heaps_law",
    "q244_seasonal_decompose",
]


@pytest.mark.parametrize("name", R10_COHORT)
def test_r10_cohort_no_cartesian(spark, name):
    # every round-10 join is either key-equality or a broadcast of a
    # calendar/grain-bounded frame (lag roster, bin roster, scalar
    # totals, day-grain pair generation) — an unbroadcast cartesian
    # is always a regression
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name


def test_q230_bar_key_partitioned_windows(spark):
    # OHLC open/close windows partition by the bar key — a global
    # window here would serialize the fact table
    plan = plan_of(spark, "q230_ohlc_bars")
    assert plan.count("Exchange SinglePartition") == 0
    assert "windowspecdefinition(day" in plan


R11_COHORT = [
    "q245_mann_whitney_u",
    "q246_jarque_bera",
    "q247_brown_forsythe",
    "q248_pacf",
    "q249_ab_test_lift",
    "q250_embedding_leakage",
    "q251_pca_power_iteration",
    "q252_knn_assortativity",
    "q253_interval_overlap_join",
    "q254_waiting_orders",
]


@pytest.mark.parametrize("name", R11_COHORT)
def test_r11_cohort_no_cartesian(spark, name):
    # every round-11 join is key-equality, a broadcast of a bounded
    # frame (probe roster, group medians, day scalars, supplier dim),
    # or an equi-keyed range join — an unbroadcast cartesian is
    # always a regression
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name


def test_q245_single_scan_no_join(spark):
    # histogram -> domain window -> one scalar aggregate: the only
    # data-sized pass is the value-grain aggregation; no joins at all
    plan = live_plan(plan_of(spark, "q245_mann_whitney_u"))
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_q246_q249_zero_join_single_scan(spark):
    for name in ("q246_jarque_bera", "q249_ab_test_lift"):
        plan = live_plan(plan_of(spark, name))
        assert "Join" not in plan, name
        assert plan.count("Scan parquet") == 1, name


def test_q248_reads_only_the_day_literal(spark):
    # the day frame is collected once (the q178 convention): the
    # returned plan computes from the VALUES literal only — no
    # parquet scan survives into the live plan, and the local
    # relation is a LocalTableScan, never a python-backed RDD
    plan = live_plan(plan_of(spark, "q248_pacf"))
    assert "LocalTableScan" in plan
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" not in plan
    assert "CartesianProduct" not in plan


def test_q250_probe_broadcast_shape(spark):
    # probes are a 64-row literal-capped roster: exactly one BNLJ
    # (the probe cross join) builds on the broadcast side, the
    # argmax is an aggregation — no window over the scored stream
    plan = live_plan(plan_of(spark, "q250_embedding_leakage"))
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q251_local_loadings_no_corpus_rescan(spark):
    # the returned frame joins the VALUES loading literal with the
    # 1-row energy scalar; the corpus is read through the persisted
    # integer-grid cache, never re-scanned from parquet
    plan = live_plan(plan_of(spark, "q251_pca_power_iteration"))
    assert "LocalTableScan" in plan
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan


def test_q253_equi_keyed_range_join(spark):
    # the overlap join must be KEYED on user_id (hash join — at test
    # SF the island side auto-broadcasts, at scale it degrades to a
    # co-partitioned shuffle join; both keep the range conditions as
    # residual filters), never a nested-loop over the interval sets
    plan = plan_of(spark, "q253_interval_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join [user_id" in plan


def test_q254_takeordered_with_dim_broadcast(spark):
    plan = plan_of(spark, "q254_waiting_orders")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # the supplier dim
    assert "CartesianProduct" not in plan


R11B_COHORT = [
    "q255_bfs_reachability",
    "q256_isotonic_calibration",
    "q257_woe_iv",
    "q258_textrank_keywords",
    "q259_conformal_coverage",
    "q260_intrinsic_dimension",
    "q261_periodogram",
    "q262_group_kfold",
]


@pytest.mark.parametrize("name", R11B_COHORT)
def test_r11b_cohort_no_cartesian(spark, name):
    # every round-11b join is key-equality, a hinted broadcast of a
    # bounded frame (score grain, k roster, 1-row scalars, probe
    # sample), or set-semantics BFS machinery — an unbroadcast
    # cartesian is always a regression
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "q256_isotonic_calibration",
        "q257_woe_iv",
        "q258_textrank_keywords",
        "q259_conformal_coverage",
        "q261_periodogram",
    ],
)
def test_r11b_no_corpus_rescan(spark, name):
    # the r11b regression this cohort's plan audit caught: uncached
    # reuse of a corpus-derived frame re-ran the tokenize/scan per
    # consumer (q258 planned 45 parquet scans). With the grain frames
    # persisted, the LIVE plan reads only InMemoryTableScan — zero
    # parquet scans survive outside the cache-population pass
    plan = live_plan(plan_of(spark, name))
    assert plan.count("Scan parquet") == 0, name


def test_q256_pav_join_is_bnlj_on_score_grain(spark):
    # the (j <= k) inequality self-join runs on the <=101-row score
    # grain with the right side hinted: exactly one BNLJ, never a
    # CartesianProduct (which is what an unhinted non-equi inner
    # join degrades to with size-based broadcast off)
    plan = live_plan(plan_of(spark, "q256_isotonic_calibration"))
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_q259_windows_partition_by_event_type(spark):
    # the residual-quantile cumulative window is keyed by event_type
    # — a global (unpartitioned) window here would serialize the
    # residual grain through one task
    plan = plan_of(spark, "q259_conformal_coverage")
    assert "Exchange SinglePartition" not in live_plan(plan)
    assert "windowspecdefinition(event_type" in plan


def test_q260_no_window_over_scored_stream(spark):
    # the two-NN selection is two map-side min(struct) aggregations;
    # a Window over the 64 x corpus scored frame would be the slow
    # shape the operator exists to avoid
    plan = live_plan(plan_of(spark, "q260_intrinsic_dimension"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q255_result_is_literal_frame(spark):
    # BFS collapses its seeds x hops histogram into a collected local
    # frame (the kcore_peel device): no join, no parquet scan, no
    # iterative lineage survives into the returned plan
    plan = plan_of(spark, "q255_bfs_reachability")
    assert "Join" not in plan
    assert "Scan parquet" not in plan


def test_q262_scan_prunes_to_id_and_length(spark):
    # the only parquet scan in the live plan is the fold-stats join:
    # doc_id + n_chars only (text is read inside the persisted
    # cluster machinery, not re-scanned here)
    plan = live_plan(plan_of(spark, "q262_group_kfold"))
    assert plan.count("Scan parquet") == 1
    assert "struct<doc_id:bigint,n_chars:bigint>" in plan


R11C_COHORT = [
    "q263_clustering_agreement",
    "q264_hodges_lehmann",
    "q265_bh_fdr",
    "q266_nelson_aalen",
]


@pytest.mark.parametrize("name", R11C_COHORT)
def test_r11c_cohort_no_cartesian(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name


def test_q263_single_scan_to_contingency_grain(spark):
    # one corpus aggregation to the <=16x10 contingency frame; every
    # downstream marginal/metric reads the cache
    plan = live_plan(plan_of(spark, "q263_clustering_agreement"))
    assert plan.count("Scan parquet") == 0


def test_q264_walsh_pairs_on_value_grain(spark):
    # the Walsh-pair join runs on the persisted value-domain
    # histogram (never row grain): exactly one fact scan (the
    # mean/count aggregate), no single-partition exchange — the
    # median window partitions by event_type
    plan = live_plan(plan_of(spark, "q264_hodges_lehmann"))
    assert plan.count("Scan parquet") == 1
    assert "Exchange SinglePartition" not in plan
    full = plan_of(spark, "q264_hodges_lehmann")
    assert "windowspecdefinition(event_type" in full


def test_q265_single_scan_source_grain(spark):
    plan = live_plan(plan_of(spark, "q265_bh_fdr"))
    assert plan.count("Scan parquet") == 0


def test_q266_signup_frame_cached(spark):
    # su (user-grain signup minima) is persisted: the purchase join
    # and the duration frame must not re-run its fact scan — the live
    # plan keeps only the purchase-filter scan and the horizon scan
    plan = live_plan(plan_of(spark, "q266_nelson_aalen"))
    assert plan.count("Scan parquet") == 2


R11D_COHORT = [
    "q267_idle_balance_blame",
    "q268_mase_backtest",
    "q269_platt_scaling",
    "q270_matching_att",
]


@pytest.mark.parametrize("name", R11D_COHORT)
def test_r11d_cohort_no_cartesian(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name


def test_q267_antijoin_is_key_equality(spark):
    # the never-ordered check must be a custkey-keyed anti join
    # (shuffle-safe at scale), never a nested loop over customers
    plan = plan_of(spark, "q267_idle_balance_blame")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin BuildRight, LeftAnti" not in plan


def test_q268_lags_partition_by_event_type(spark):
    plan = plan_of(spark, "q268_mase_backtest")
    assert "windowspecdefinition(event_type" in plan
    # r12 densify: exactly ONE SinglePartition exchange is allowed —
    # the 1-row min/max calendar-bounds reduction (partial-aggregate
    # rows = partition count, a scalar fold at any scale). The lag
    # windows themselves must stay event_type-keyed, never global.
    assert live_plan(plan).count("Exchange SinglePartition") <= 1
    assert "partial_min" in plan and "partial_max" in plan


def test_q269_newton_reads_cached_grain_only(spark):
    # all three Newton passes + the final ECE aggregate read the
    # persisted 101-row score histogram: zero parquet scans live
    plan = live_plan(plan_of(spark, "q269_platt_scaling"))
    assert plan.count("Scan parquet") == 0


def test_q270_matching_on_count_grain(spark):
    # the nearest-count match is a grain^2 rank over the broadcast
    # control histogram; the live plan reads the persisted customer
    # frame, never re-scanning the facts
    plan = live_plan(plan_of(spark, "q270_matching_att"))
    assert plan.count("Scan parquet") == 0
    full = plan_of(spark, "q270_matching_att")
    assert "windowspecdefinition(cnt" in full


def test_q271_q272_no_cartesian_and_shapes(spark):
    p271 = plan_of(spark, "q271_kruskal_wallis")
    assert "CartesianProduct" not in p271
    # both grain aggregations read the persisted (g, x) projection
    assert live_plan(p271).count("Scan parquet") == 0
    p272 = plan_of(spark, "q272_cuped_adjustment")
    assert "CartesianProduct" not in p272
    # three pruned fact passes (population, pre, post) — no window,
    # no sort, one moment aggregate
    assert "Window" not in live_plan(p272)
