"""Hand-verified cases for the round-9 operators: exact Gini /
Lorenz via the ranking device, midrank Spearman, Kendall tau-b,
G-test collocations, monthly cohort retention, day-of-week
seasonality, duplicate-cluster power-law MLE, interval islands,
nearest-rank percentile bands, Jensen-Shannon divergence, Zipf OLS
fit, and naive-Python recomputation of the classifier-eval trio
(calibration bins / PR curve / KS) — each checked against values
computed by hand or by a trivially-correct reimplementation."""

from __future__ import annotations

import math
import os
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from lynx_spark.plans.analytics import REGISTRY

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
ORD_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]
EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _docs_dir(spark, tmp, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        os.path.join(tmp, "documents.parquet")
    )
    return tmp


def _doc(i, text, lang="en", source="web"):
    return (i, text, lang, source, len(text))


def test_q205_gini_hand(spark):
    # token counts [1, 1, 1, 5] ascending: sum(r*x) = 1+2+3+20 = 26,
    # G = 2*26/(4*8) - 5/4 = 0.375; all-equal corpus -> G = 0
    with tempfile.TemporaryDirectory() as tmp:
        _docs_dir(
            spark,
            tmp,
            [
                _doc(1, "a"),
                _doc(2, "b"),
                _doc(3, "c"),
                _doc(4, "p q r s t"),
            ],
        )
        row = REGISTRY["q205_gini_concentration"].fn(spark, tmp).collect()[0]
    assert row["n_docs"] == 4 and row["total_tokens"] == 8
    assert row["gini"] == pytest.approx(0.375, abs=1e-6)
    with tempfile.TemporaryDirectory() as tmp:
        _docs_dir(spark, tmp, [_doc(i, "x y") for i in range(4)])
        row = REGISTRY["q205_gini_concentration"].fn(spark, tmp).collect()[0]
    assert row["gini"] == pytest.approx(0.0, abs=1e-6)


def test_q206_lorenz_hand(spark):
    # n=4 < k=10: tile == rank; ascending tokens [1,1,1,5] ->
    # cum shares 1/8, 2/8, 3/8, 8/8
    with tempfile.TemporaryDirectory() as tmp:
        _docs_dir(
            spark,
            tmp,
            [
                _doc(1, "a"),
                _doc(2, "b"),
                _doc(3, "c"),
                _doc(4, "p q r s t"),
            ],
        )
        out = {
            r["decile"]: r
            for r in REGISTRY["q206_lorenz_deciles"].fn(spark, tmp).collect()
        }
    assert [out[d]["cum_tokens"] for d in sorted(out)] == [1, 2, 3, 8]
    assert out[4]["cum_share"] == pytest.approx(1.0, abs=1e-6)
    assert out[1]["cum_share"] == pytest.approx(0.125, abs=1e-6)


def test_q209_spearman_hand(spark):
    # x and y share tie structure and are co-monotone -> rho = 1;
    # reversing y flips the sign exactly
    texts_up = ["w", "w w", "w w", "w w w"]  # y = 1,2,2,3
    chars = [10, 20, 20, 30]  # x ties mirror y's
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (i, texts_up[i], "en", "web", chars[i]) for i in range(4)
        ]
        _docs_dir(spark, tmp, rows)
        row = REGISTRY["q209_spearman_rank_corr"].fn(spark, tmp).collect()[0]
    assert row["spearman_rho"] == pytest.approx(1.0, abs=1e-6)
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (i, texts_up[3 - i], "en", "web", chars[i]) for i in range(4)
        ]
        _docs_dir(spark, tmp, rows)
        row = REGISTRY["q209_spearman_rank_corr"].fn(spark, tmp).collect()[0]
    assert row["spearman_rho"] == pytest.approx(-1.0, abs=1e-6)


def test_q207_gtest_hand(spark):
    # one dominant bigram; G recomputed from the 2x2 contingency by a
    # naive python implementation over the same bigram marginals
    with tempfile.TemporaryDirectory() as tmp:
        _docs_dir(
            spark,
            tmp,
            [_doc(i, "a b") for i in range(6)]
            + [_doc(10, "c d c d c d c d c d")],
        )
        out = {
            (r["w1"], r["w2"]): r
            for r in REGISTRY["q207_gtest_collocations"].fn(spark, tmp).collect()
        }
    # bigram table: (a,b)=6, (c,d)=5, (d,c)=4 -> N=15
    # left marginals: a->6, c->5, d->4; right: b->6, d->5, c->4
    def g2(nab, ca, cb, nn):
        tot = 0.0
        for o, r_, c_ in (
            (nab, ca, cb),
            (ca - nab, ca, nn - cb),
            (cb - nab, nn - ca, cb),
            (nn - ca - cb + nab, nn - ca, nn - cb),
        ):
            if o > 0:
                tot += o * math.log(o * nn / (r_ * c_))
        return math.floor(2.0 * tot * 1e6 + 0.5) / 1e6

    assert ("a", "b") in out and ("c", "d") in out
    assert ("d", "c") not in out  # n_ab = 4 < 5
    assert out[("a", "b")]["g2"] == pytest.approx(
        g2(6, 6, 6, 15), abs=2e-6
    )
    assert out[("c", "d")]["g2"] == pytest.approx(
        g2(5, 5, 5, 15), abs=2e-6
    )


def _orders_dir(spark, tmp, rows):
    spark.createDataFrame(rows, ORD_COLS).write.parquet(
        os.path.join(tmp, "orders.parquet")
    )
    return tmp


def test_q208_kendall_hand(spark):
    # month (rev_cents, cnt): jan (1,1), feb (2,1), mar (2,2):
    # (jan,feb) cnt tie; (jan,mar) concordant; (feb,mar) rev tie ->
    # C=1 D=0 tx=1 ty=1, tau_b = 1/sqrt((3-1)*(3-1)) = 0.5
    rows = [
        (1, 1, "O", 0.01, datetime(2024, 1, 5), "1-URGENT"),
        (2, 1, "O", 0.02, datetime(2024, 2, 5), "1-URGENT"),
        (3, 2, "O", 0.01, datetime(2024, 3, 5), "1-URGENT"),
        (4, 2, "O", 0.01, datetime(2024, 3, 6), "1-URGENT"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _orders_dir(spark, tmp, rows)
        row = REGISTRY["q208_kendall_tau"].fn(spark, tmp).collect()[0]
    assert row["n_months"] == 3
    assert row["concordant"] == 1 and row["discordant"] == 0
    assert row["tau_b"] == pytest.approx(0.5, abs=1e-9)


def test_q210_cohort_hand(spark):
    # custs 1,2 first order in jan-2024; cust 1 returns in feb ->
    # retention (jan, 0) = 1.0, (jan, 1) = 0.5
    rows = [
        (1, 1, "O", 10.0, datetime(2024, 1, 5), "1-URGENT"),
        (2, 2, "O", 10.0, datetime(2024, 1, 9), "1-URGENT"),
        (3, 1, "O", 10.0, datetime(2024, 2, 5), "1-URGENT"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _orders_dir(spark, tmp, rows)
        out = {
            (r["cohort_month"], r["month_offset"]): r
            for r in REGISTRY["q210_cohort_retention"].fn(spark, tmp).collect()
        }
    jan = 2024 * 12 + 1
    assert out[(jan, 0)]["n_active"] == 2
    assert out[(jan, 0)]["retention"] == 1.0
    assert out[(jan, 1)]["n_active"] == 1
    assert out[(jan, 1)]["retention"] == 0.5
    assert out[(jan, 1)]["cohort_size"] == 2


def test_q211_dow_hand(spark):
    # 2024-01-07 is a Sunday -> dow 0; 2024-01-01 a Monday -> dow 1
    rows = [
        (1, datetime(2024, 1, 7, 9), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 14, 9), 1, "view", 2.0, "{}"),
        (3, datetime(2024, 1, 1, 9), 1, "view", 3.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows, EV_COLS).write.parquet(
            os.path.join(tmp, "events.parquet")
        )
        out = {
            r["dow"]: r
            for r in REGISTRY["q211_dow_seasonality"].fn(spark, tmp).collect()
        }
    assert out[0]["n_days"] == 2 and out[0]["total_cents"] == 300
    assert out[0]["avg_day_cents"] == pytest.approx(150.0, abs=1e-6)
    assert out[1]["total_cents"] == 300
    assert out[0]["share"] == pytest.approx(0.5, abs=1e-6)


def test_q213_powerlaw_hand(spark):
    # cluster sizes [2, 2, 4]: alpha = 1 + n*1e6/sum(grid ln(s/1.5))
    with tempfile.TemporaryDirectory() as tmp:
        _docs_dir(
            spark,
            tmp,
            [
                _doc(1, "dup one"), _doc(2, "dup one"),
                _doc(3, "dup two"), _doc(4, "dup two"),
                _doc(5, "dup big"), _doc(6, "dup big"),
                _doc(7, "dup big"), _doc(8, "dup big"),
                _doc(9, "unique text"),
            ],
        )
        row = (
            REGISTRY["q213_dup_cluster_powerlaw"].fn(spark, tmp).collect()[0]
        )
    sum6 = sum(
        math.floor(math.log(s / 1.5) * 1e6 + 0.5) for s in (2, 2, 4)
    )
    exp = math.floor((1.0 + 3 * 1e6 / sum6) * 1e6 + 0.5) / 1e6
    assert row["n_clusters"] == 3
    assert row["n_docs_in_dups"] == 8
    assert row["max_size"] == 4
    assert row["alpha_hat"] == pytest.approx(exp, abs=1e-9)


def test_q214_islands_hand(spark):
    # user 1: events at 09:00 and 09:10 merge (30-min spans overlap);
    # 12:00 starts a new island. durations 40 min and 30 min.
    rows = [
        (1, datetime(2024, 1, 1, 9, 0), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 9, 10), 1, "view", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 12, 0), 1, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows, EV_COLS).write.parquet(
            os.path.join(tmp, "events.parquet")
        )
        row = REGISTRY["q214_interval_islands"].fn(spark, tmp).collect()[0]
    assert row["n_islands"] == 2 and row["n_events"] == 3
    assert row["avg_events_per_island"] == pytest.approx(1.5, abs=1e-6)
    assert row["avg_island_sec"] == pytest.approx(2100.0, abs=1e-6)
    assert row["max_island_sec"] == pytest.approx(2400.0, abs=1e-9)


def test_q215_percentile_bands_hand(spark):
    # source A, n_chars 1..4 (nearest-rank): p25=1 p50=2 p75=3 p90=4
    with tempfile.TemporaryDirectory() as tmp:
        rows = [(i, "x", "en", "A", i) for i in range(1, 5)]
        _docs_dir(spark, tmp, rows)
        row = (
            REGISTRY["q215_source_percentile_bands"]
            .fn(spark, tmp)
            .collect()[0]
        )
    assert (row["p25"], row["p50"], row["p75"], row["p90"]) == (1, 2, 3, 4)
    assert row["n_docs"] == 4


def test_q217_jsd_hand(spark):
    # sources with disjoint single languages against a 50/50 corpus:
    # JSD = 0.5*ln(4/3) + 0.25*ln(2/3) + 0.25*ln 2 for each source
    with tempfile.TemporaryDirectory() as tmp:
        _docs_dir(
            spark,
            tmp,
            [(1, "x", "en", "A", 1), (2, "y", "fr", "B", 1)],
        )
        out = {
            r["source"]: r
            for r in REGISTRY["q217_js_divergence"].fn(spark, tmp).collect()
        }
    p_term = 1.0 * math.log(1.0 / 0.75)
    q_terms = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    exp = math.floor((0.5 * p_term + 0.5 * q_terms) * 1e6 + 0.5) / 1e6
    for src in ("A", "B"):
        assert out[src]["jsd"] == pytest.approx(exp, abs=1e-9)
    # a source that IS the corpus diverges by zero
    with tempfile.TemporaryDirectory() as tmp:
        _docs_dir(spark, tmp, [(1, "x", "en", "A", 1)])
        row = REGISTRY["q217_js_divergence"].fn(spark, tmp).collect()[0]
    assert row["jsd"] == pytest.approx(0.0, abs=1e-9)


def test_q212_zipf_hand(spark):
    # frequencies 48/r at ranks 1..3 -> ln(freq) = ln 48 - ln(rank)
    # exactly: slope = -1, r^2 = 1 (up to the 1e-6 ln grid)
    words = ["a"] * 48 + ["b"] * 24 + ["c"] * 16 + ["z"] * 2
    with tempfile.TemporaryDirectory() as tmp:
        _docs_dir(spark, tmp, [_doc(1, " ".join(words))])
        row = REGISTRY["q212_zipf_slope"].fn(spark, tmp).collect()[0]
    assert row["n_types"] == 3  # z is below min_count
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=1e-4)
    assert row["r_squared"] == pytest.approx(1.0, abs=1e-4)


def test_classifier_eval_trio_vs_naive_python(spark):
    """q202/q203/q204 against a naive per-row python recomputation on
    the real sf0.001 corpus — an independent check that the bounded
    score-grid devices equal the definitionally-direct statistics."""
    from lynx_spark.plans.analytics import _pred_frame

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r["p"], r["y"]) for r in _pred_frame(spark, sf).collect()
    ]
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos

    # q204: naive KS over every distinct threshold
    ks_best, ks_p = -1, None
    for thr in sorted({p for p, _ in pairs}):
        fp_ = sum(1 for p, y in pairs if p <= thr and y == 1) / n_pos
        fn_ = sum(1 for p, y in pairs if p <= thr and y == 0) / n_neg
        dv = abs(fp_ - fn_)
        if dv > ks_best + 1e-15:
            ks_best, ks_p = dv, thr
    row = REGISTRY["q204_ks_statistic"].fn(spark, sf).collect()[0]
    assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
    assert row["ks_stat"] == pytest.approx(ks_best, abs=2e-6)
    assert row["ks_at_p"] == pytest.approx(ks_p, abs=1e-9)

    # q202: naive bin means
    out = {
        r["bin"]: r
        for r in REGISTRY["q202_calibration_bins"].fn(spark, sf).collect()
    }
    import collections

    bins = collections.defaultdict(list)
    for p, y in pairs:
        s4 = math.floor(p * 10000 + 0.5)
        bins[min(s4 // 1000, 9)].append((s4, y))
    for b, members in bins.items():
        avg_pred = sum(s for s, _ in members) / (10000.0 * len(members))
        obs = sum(y for _, y in members) / len(members)
        assert out[b]["n_docs"] == len(members)
        assert out[b]["avg_pred"] == pytest.approx(avg_pred, abs=2e-6)
        assert out[b]["obs_rate"] == pytest.approx(obs, abs=2e-6)

    # q203: naive precision/recall at three sample thresholds
    curve = {
        r["p_threshold"]: r
        for r in REGISTRY["q203_pr_curve"].fn(spark, sf).collect()
    }
    some = sorted(curve)[:: max(1, len(curve) // 3)][:3]
    for thr in some:
        tp = sum(1 for p, y in pairs if p >= thr and y == 1)
        fp_ = sum(1 for p, y in pairs if p >= thr and y == 0)
        assert curve[thr]["cum_tp"] == tp
        assert curve[thr]["cum_fp"] == fp_
        assert curve[thr]["precision_at"] == pytest.approx(
            tp / (tp + fp_), abs=2e-6
        )
        assert curve[thr]["recall_at"] == pytest.approx(
            tp / n_pos, abs=2e-6
        )
