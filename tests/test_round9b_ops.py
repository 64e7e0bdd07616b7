"""Hand-verified cases for the round-9 second batch: Kaplan-Meier
survival, single change-point detection, lexical diversity, Cramér's
V (plain + bias-corrected), and Neyman stratified allocation — each
checked against values computed by hand on a mini fixture."""

from __future__ import annotations

import math
import os
import tempfile
from datetime import datetime

import pytest

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
CUST_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
NAT_COLS = ["n_nationkey", "n_name", "n_regionkey"]


def _write(spark, tmp, name, rows, cols):
    spark.createDataFrame(rows, cols).write.parquet(
        os.path.join(tmp, f"{name}.parquet")
    )


def test_q218_kaplan_meier_hand(spark):
    # c1: Jan1+Jan3 (t=2 evt); c2: Jan1+Jan3 (t=2 evt); c3: Jan1 only
    # (censored t=4, horizon Jan5); c4: Jan2+Jan3 (t=1 evt); c5: Jan5
    # only (censored t=0). At-risk: t=1 -> 4, t=2 -> 3.
    # S(1) = 3/4 = 0.75; S(2) = 0.75 * 1/3 = 0.25.
    rows = [
        (1, 1, "O", 1.0, datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "O", 1.0, datetime(2024, 1, 3), "1-URGENT"),
        (3, 2, "O", 1.0, datetime(2024, 1, 1), "1-URGENT"),
        (4, 2, "O", 1.0, datetime(2024, 1, 3), "1-URGENT"),
        (5, 3, "O", 1.0, datetime(2024, 1, 1), "1-URGENT"),
        (6, 4, "O", 1.0, datetime(2024, 1, 2), "1-URGENT"),
        (7, 4, "O", 1.0, datetime(2024, 1, 3), "1-URGENT"),
        (8, 5, "O", 1.0, datetime(2024, 1, 5), "1-URGENT"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "orders", rows, ORD_COLS)
        out = {
            r["t_days"]: r
            for r in REGISTRY["q218_kaplan_meier"].fn(spark, tmp).collect()
        }
    assert set(out) == {1, 2}
    assert out[1]["n_at_risk"] == 4 and out[1]["n_events"] == 1
    assert out[2]["n_at_risk"] == 3 and out[2]["n_events"] == 2
    assert out[1]["survival"] == pytest.approx(0.75, abs=2e-6)
    assert out[2]["survival"] == pytest.approx(0.25, abs=2e-6)


def test_q218_kaplan_meier_drops_to_zero(spark):
    # both customers repeat at t=1 -> last factor (n-d)/n = 0 ->
    # survival exactly 0.0 (the zero flag, not exp(-inf))
    rows = [
        (1, 1, "O", 1.0, datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "O", 1.0, datetime(2024, 1, 2), "1-URGENT"),
        (3, 2, "O", 1.0, datetime(2024, 1, 1), "1-URGENT"),
        (4, 2, "O", 1.0, datetime(2024, 1, 2), "1-URGENT"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "orders", rows, ORD_COLS)
        out = REGISTRY["q218_kaplan_meier"].fn(spark, tmp).collect()
    assert len(out) == 1
    assert out[0]["t_days"] == 1
    assert out[0]["n_at_risk"] == 2 and out[0]["n_events"] == 2
    assert out[0]["survival"] == 0.0


def test_q219_changepoint_hand(spark):
    # monthly revenue 100, 100, 400, 400 dollars -> perfect split
    # after Feb: var_explained = 1.0, means 10000/40000 cents
    rows = [
        (1, 1, "O", 100.0, datetime(2024, 1, 5), "1-URGENT"),
        (2, 1, "O", 100.0, datetime(2024, 2, 5), "1-URGENT"),
        (3, 1, "O", 400.0, datetime(2024, 3, 5), "1-URGENT"),
        (4, 1, "O", 400.0, datetime(2024, 4, 5), "1-URGENT"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "orders", rows, ORD_COLS)
        row = REGISTRY["q219_changepoint"].fn(spark, tmp).collect()[0]
    assert row["n_months"] == 4
    assert row["split_mi"] == 2024 * 12 + 2
    assert row["left_months"] == 2
    assert row["left_mean_cents"] == pytest.approx(10000.0, abs=1e-6)
    assert row["right_mean_cents"] == pytest.approx(40000.0, abs=1e-6)
    assert row["var_explained"] == pytest.approx(1.0, abs=1e-6)


def test_q219_changepoint_flat_series(spark):
    # constant revenue -> SST = 0 -> var_explained = 0.0 (guard)
    rows = [
        (i, 1, "O", 100.0, datetime(2024, i, 5), "1-URGENT")
        for i in range(1, 5)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "orders", rows, ORD_COLS)
        row = REGISTRY["q219_changepoint"].fn(spark, tmp).collect()[0]
    assert row["var_explained"] == 0.0


def test_q220_lexical_diversity_hand(spark):
    # source A: "a a b" -> N=3 V=2 hapax=1, TTR=2/3, C=ln2/ln3;
    # source B: "x y" -> N=2 V=2 hapax=2, TTR=1, C=1
    docs = [
        (1, "a a b", "en", "A", 5),
        (2, "x y", "en", "B", 3),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "documents", docs, DOC_SCHEMA)
        out = {
            r["source"]: r
            for r in REGISTRY["q220_lexical_diversity"]
            .fn(spark, tmp)
            .collect()
        }
    a, b = out["A"], out["B"]
    assert (a["n_tokens"], a["vocab"], a["hapax"]) == (3, 2, 1)
    assert a["ttr"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["hapax_share"] == pytest.approx(0.5, abs=1e-6)
    assert a["herdan_c"] == pytest.approx(
        math.log(2) / math.log(3), abs=1e-6
    )
    assert (b["n_tokens"], b["vocab"], b["hapax"]) == (2, 2, 2)
    assert b["ttr"] == pytest.approx(1.0, abs=1e-6)
    assert b["herdan_c"] == pytest.approx(1.0, abs=1e-6)


def test_q221_cramers_v_perfect_association(spark):
    # 2x2, segment determines nation -> chi2 = n = 4, V = 1,
    # corrected V = sqrt((1 - 1/3) / (2 - 1/3 - 1)) = 1
    cust = [
        (1, "a", 0, 0.0, "S1"),
        (2, "b", 0, 0.0, "S1"),
        (3, "c", 1, 0.0, "S2"),
        (4, "d", 1, 0.0, "S2"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "customer", cust, CUST_COLS)
        row = REGISTRY["q221_cramers_v"].fn(spark, tmp).collect()[0]
    assert row["n_customers"] == 4
    assert row["r_levels"] == 2 and row["c_levels"] == 2
    assert row["chi2"] == pytest.approx(4.0, abs=1e-6)
    assert row["cramers_v"] == pytest.approx(1.0, abs=1e-6)
    assert row["cramers_v_corrected"] == pytest.approx(1.0, abs=1e-6)


def test_q221_cramers_v_independent(spark):
    # uniform 2x2 -> observed == expected everywhere -> chi2 = 0,
    # V = 0, corrected clamps at 0
    cust = [
        (1, "a", 0, 0.0, "S1"),
        (2, "b", 1, 0.0, "S1"),
        (3, "c", 0, 0.0, "S2"),
        (4, "d", 1, 0.0, "S2"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "customer", cust, CUST_COLS)
        row = REGISTRY["q221_cramers_v"].fn(spark, tmp).collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert row["cramers_v"] == pytest.approx(0.0, abs=1e-6)
    assert row["cramers_v_corrected"] == pytest.approx(0.0, abs=1e-6)


def test_q222_neyman_allocation_hand(spark):
    # nation 0: cents [100, 300] -> sd = sqrt(20000) -> sdc 14142,
    #   wh = 28284
    # nation 1: cents [100, 100] -> sd 0 -> wh 0
    # nation 2: cents [100, 500, 100, 500] -> sd = sqrt(160000/3)
    #   -> sdc 23094, wh = 92376
    # tot 120660: floors 234/0/765 (sum 999), largest remainder
    # (nation 2, rem 71100) takes the +1 -> 234/0/766, sum = 1000
    cust = [
        (1, "a", 0, 0.0, "S"),
        (2, "b", 1, 0.0, "S"),
        (3, "c", 2, 0.0, "S"),
    ]
    orders = [
        (1, 1, "O", 1.0, datetime(2024, 1, 1), "P"),
        (2, 1, "O", 3.0, datetime(2024, 1, 2), "P"),
        (3, 2, "O", 1.0, datetime(2024, 1, 1), "P"),
        (4, 2, "O", 1.0, datetime(2024, 1, 2), "P"),
        (5, 3, "O", 1.0, datetime(2024, 1, 1), "P"),
        (6, 3, "O", 5.0, datetime(2024, 1, 2), "P"),
        (7, 3, "O", 1.0, datetime(2024, 1, 3), "P"),
        (8, 3, "O", 5.0, datetime(2024, 1, 4), "P"),
    ]
    nation = [(0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1)]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "customer", cust, CUST_COLS)
        _write(spark, tmp, "orders", orders, ORD_COLS)
        _write(spark, tmp, "nation", nation, NAT_COLS)
        out = {
            r["n_name"]: r
            for r in REGISTRY["q222_neyman_allocation"]
            .fn(spark, tmp)
            .collect()
        }
    assert out["ALGERIA"]["n_orders"] == 2
    assert out["ALGERIA"]["sd_cents"] == pytest.approx(141.42, abs=1e-9)
    assert out["ARGENTINA"]["sd_cents"] == 0.0
    assert out["BRAZIL"]["sd_cents"] == pytest.approx(230.94, abs=1e-9)
    assert out["ALGERIA"]["alloc"] == 234
    assert out["ARGENTINA"]["alloc"] == 0
    assert out["BRAZIL"]["alloc"] == 766
    assert sum(r["alloc"] for r in out.values()) == 1000


def test_q222_neyman_allocation_sums_to_budget_at_sf(spark):
    from tests.conftest import SF_DIR

    out = REGISTRY["q222_neyman_allocation"].fn(spark, SF_DIR).collect()
    assert sum(r["alloc"] for r in out) == 1000
    assert all(r["alloc"] >= 0 for r in out)


LI_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]
SUPP_COLS = ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]


def test_q223_welch_hand(spark):
    # URGENT cents [100, 300]: m1=200 se1=10000; LOW [200, 200, 800]:
    # m2=400 se2=40000 -> t = -200/sqrt(50000) = -0.894427,
    # df = 50000^2 / (1e8/1 + 1.6e9/2) = 2.777778
    rows = [
        (1, 1, "O", 1.0, datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "O", 3.0, datetime(2024, 1, 2), "1-URGENT"),
        (3, 1, "O", 2.0, datetime(2024, 1, 3), "5-LOW"),
        (4, 1, "O", 2.0, datetime(2024, 1, 4), "5-LOW"),
        (5, 1, "O", 8.0, datetime(2024, 1, 5), "5-LOW"),
        (6, 1, "O", 99.0, datetime(2024, 1, 6), "3-MEDIUM"),  # ignored
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "orders", rows, ORD_COLS)
        row = REGISTRY["q223_welch_ttest"].fn(spark, tmp).collect()[0]
    assert row["n1"] == 2 and row["n2"] == 3
    assert row["mean1_cents"] == pytest.approx(200.0, abs=1e-6)
    assert row["mean2_cents"] == pytest.approx(400.0, abs=1e-6)
    assert row["t_stat"] == pytest.approx(-0.894427, abs=1e-6)
    assert row["welch_df"] == pytest.approx(2.777778, abs=1e-6)


def test_q224_runs_test_hand(spark):
    # strictly increasing months [100..500]: median=300 dropped,
    # signs [-1,-1,+1,+1] -> runs=2, n1=n2=2,
    # mu=3, var=2/3, z = -1/sqrt(2/3) = -1.224745
    rows = [
        (i, 1, "O", float(i), datetime(2024, i, 5), "P")
        for i in range(1, 6)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "orders", rows, ORD_COLS)
        row = REGISTRY["q224_runs_test"].fn(spark, tmp).collect()[0]
    assert row["n1"] == 2 and row["n2"] == 2
    assert row["runs"] == 2
    assert row["z_stat"] == pytest.approx(-1.224745, abs=1e-6)


def test_q225_hhi_hand(spark):
    # nation 0, two suppliers with revenue cents 100 / 300:
    # HHI = (100^2 + 300^2)/400^2 = 0.625, effective = 1.6
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(2024, 1, 1)),
        (2, 1, 2, 1, 1.0, 3.0, 0.0, 0.0, "N", "O", datetime(2024, 1, 1)),
    ]
    supp = [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0)]
    nation = [(0, "ALGERIA", 0)]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "lineitem", li, LI_COLS)
        _write(spark, tmp, "supplier", supp, SUPP_COLS)
        _write(spark, tmp, "nation", nation, NAT_COLS)
        row = REGISTRY["q225_hhi_concentration"].fn(spark, tmp).collect()[0]
    assert row["n_name"] == "ALGERIA"
    assert row["n_suppliers"] == 2
    assert row["revenue_cents"] == 400
    assert row["hhi"] == pytest.approx(0.625, abs=1e-6)
    assert row["effective_suppliers"] == pytest.approx(1.6, abs=1e-6)


def test_q226_durbin_watson_hand(spark):
    # monthly cents [100, 200, 100, 200]: OLS slope 20, residuals
    # [-20, 60, -60, 20] -> num = 80^2+120^2+80^2 = 27200,
    # den = 8000 -> DW = 3.4 (oscillation, as expected)
    rows = [
        (1, 1, "O", 1.0, datetime(2024, 1, 5), "P"),
        (2, 1, "O", 2.0, datetime(2024, 2, 5), "P"),
        (3, 1, "O", 1.0, datetime(2024, 3, 5), "P"),
        (4, 1, "O", 2.0, datetime(2024, 4, 5), "P"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "orders", rows, ORD_COLS)
        row = REGISTRY["q226_durbin_watson"].fn(spark, tmp).collect()[0]
    assert row["n_months"] == 4
    assert row["ols_slope"] == pytest.approx(20.0, abs=1e-6)
    assert row["dw_stat"] == pytest.approx(3.4, abs=1e-6)


def test_q226_durbin_watson_perfect_fit(spark):
    # perfectly linear revenue -> all residuals snap to 0 -> den = 0
    # -> the guard reports 0.0 instead of dividing by zero
    rows = [
        (i, 1, "O", float(i), datetime(2024, i, 5), "P")
        for i in range(1, 5)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "orders", rows, ORD_COLS)
        row = REGISTRY["q226_durbin_watson"].fn(spark, tmp).collect()[0]
    assert row["dw_stat"] == 0.0


def test_q227_source_cosine_hand(spark):
    # A: {a:2, b:1}, B: {a:1, b:2} -> dot 4, norms sqrt(5) each ->
    # cosine 0.8; C shares no word -> the (A,C)/(B,C) pairs are
    # absent by inner-join construction
    docs = [
        (1, "a a b", "en", "A", 5),
        (2, "a b b", "en", "B", 5),
        (3, "c", "en", "C", 1),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "documents", docs, DOC_SCHEMA)
        out = REGISTRY["q227_source_profile_cosine"].fn(spark, tmp).collect()
    assert len(out) == 1
    assert (out[0]["s1"], out[0]["s2"]) == ("A", "B")
    assert out[0]["cosine"] == pytest.approx(0.8, abs=1e-6)


def _naive_km(durs):
    """Reference Kaplan-Meier on (t, event) pairs: product over event
    times <= t of (1 - d_i/n_i), at-risk = count(T >= t_i)."""
    times = sorted({t for t, e in durs if e})
    out = {}
    s = 1.0
    for t in times:
        n_risk = sum(1 for u, _ in durs if u >= t)
        d = sum(1 for u, e in durs if u == t and e)
        s *= (n_risk - d) / n_risk
        out[t] = (n_risk, d, s)
    return out


def test_q218_kaplan_meier_vs_naive_random(spark):
    # three seeded random order histories against the naive python
    # estimator — survival within the snapped-ln tolerance everywhere
    import random

    for seed in (7, 19, 42):
        rng = random.Random(seed)
        rows = []
        ok = 1
        for cust in range(1, 41):
            n_orders = rng.choice([1, 1, 2, 2, 2, 3])
            days = sorted(rng.sample(range(1, 200), n_orders))
            for d in days:
                rows.append(
                    (
                        ok,
                        cust,
                        "O",
                        1.0,
                        datetime(2024, 1, 1)
                        + __import__("datetime").timedelta(days=d - 1),
                        "P",
                    )
                )
                ok += 1
        maxd = max(r[4] for r in rows)
        per = {}
        for r in rows:
            per.setdefault(r[1], []).append(r[4])
        durs = []
        for c, ds in per.items():
            ds = sorted(ds)
            if len(ds) >= 2:
                durs.append(((ds[1] - ds[0]).days, True))
            else:
                durs.append(((maxd - ds[0]).days, False))
        expect = _naive_km(durs)
        with tempfile.TemporaryDirectory() as tmp:
            _write(spark, tmp, "orders", rows, ORD_COLS)
            got = {
                r["t_days"]: r
                for r in REGISTRY["q218_kaplan_meier"].fn(spark, tmp).collect()
            }
        assert set(got) == set(expect), seed
        for t, (n_risk, d, s) in expect.items():
            assert got[t]["n_at_risk"] == n_risk, (seed, t)
            assert got[t]["n_events"] == d, (seed, t)
            # each ln term is snapped to 1e-6 before the cumulative
            # sum; error grows at most linearly in #event times
            assert got[t]["survival"] == pytest.approx(
                s, abs=5e-5
            ), (seed, t)


def test_q222_neyman_invariants_random(spark):
    # apportionment invariants on seeded random strata: allocation
    # sums to the budget EXACTLY, every alloc >= its floor quota - 0,
    # and zero-variance strata get zero
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        cust = []
        orders = []
        nation = []
        ok = 1
        n_nations = rng.randint(3, 6)
        for nk in range(n_nations):
            nation.append((nk, f"NATION{nk}", 0))
            cust.append((nk + 1, f"c{nk}", nk, 0.0, "S"))
            n_ord = rng.randint(1, 8)
            const = rng.random() < 0.3
            base = rng.uniform(1, 50)
            for _ in range(n_ord):
                price = base if const or n_ord == 1 else rng.uniform(1, 50)
                orders.append(
                    (ok, nk + 1, "O", round(price, 2),
                     datetime(2024, 1, 1 + ok % 27), "P")
                )
                ok += 1
        with tempfile.TemporaryDirectory() as tmp:
            _write(spark, tmp, "customer", cust, CUST_COLS)
            _write(spark, tmp, "orders", orders, ORD_COLS)
            _write(spark, tmp, "nation", nation, NAT_COLS)
            out = (
                REGISTRY["q222_neyman_allocation"].fn(spark, tmp).collect()
            )
        total = sum(r["alloc"] for r in out)
        any_var = any(r["sd_cents"] > 0 for r in out)
        assert total == (1000 if any_var else 0), seed
        for r in out:
            assert r["alloc"] >= 0, seed
            if r["sd_cents"] == 0.0:
                assert r["alloc"] <= 1, (seed, "zero-sd stratum got >1")
