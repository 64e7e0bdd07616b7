"""Randomized property tests for the round-11 statistics cohort
(VERDICT r11 task 7): the five entries with real numeric-stability
surface, checked against scipy/statsmodels-free pure-Python closed
forms at small n.

- q251 power-iteration PCA: exact trajectory replica + rank-1 recovery
- q256 isotonic PAV: max-min formula vs the pooling PAV algorithm
- q269 Platt scaling: Newton trajectory replica on synthetic histograms
- q248 PACF: hand-unrolled Durbin closed forms vs the generic
  Durbin-Levinson recursion on a synthetic day series
- q266 Nelson-Aalen: the tie-handling estimator vs the textbook
  H(t) = sum d_i/n_i on synthetic (duration, event) data

The fit cores factored out of q256/q269 (_isotonic_fit_rates,
_platt_fit) take the binned (s, n, pos) grain directly; q248/q266 run
END-TO-END against synthetic events parquet, so the whole query path
(loader, grouping, windows) is under test, not a copy of it.
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _day(d: int) -> datetime:
    # naive UTC noon: the session timezone is UTC, so to_date/datediff
    # land on the intended calendar day
    return datetime(2024, 1, 1, 12, 0, 0) + __import__(
        "datetime"
    ).timedelta(days=d)


# ------------------------------------------------------------ q251 PCA


def _pca_python(vecs: list[list[float]], n_iters: int = 3):
    """Pure-Python replica of power_iteration_pca's documented
    trajectory (1e-6 quantize, normalized integer iterate)."""
    x6 = [[int(math.floor(x * 1e6 + 0.5)) for x in v] for v in vecs]
    dim = len(vecs[0])
    v6 = [int(math.floor(1e6 / math.sqrt(float(dim)) + 0.5))] * dim
    for _ in range(n_iters):
        w = [0] * dim
        for row in x6:
            d = sum(a * b for a, b in zip(row, v6))
            for i in range(dim):
                w[i] += row[i] * d
        wmax = max(abs(x) for x in w) or 1
        u6 = [
            int(math.floor(float(w[i]) / float(wmax) * 1e6 + 0.5))
            for i in range(dim)
        ]
        n2 = sum(u * u for u in u6) or 1
        v6 = [
            int(math.floor(float(u6[i]) * 1e6 / math.sqrt(float(n2)) + 0.5))
            for i in range(dim)
        ]
    num = 0
    den = 0
    for row in x6:
        d = sum(a * b for a, b in zip(row, v6))
        num += d * d
        den += sum(x * x for x in row)
    ratio = (
        math.floor(float(num) / float(den) / 1e12 * 1e6 + 0.5) / 1e6
        if den
        else None
    )
    return [c / 1e6 for c in v6], ratio


@given(
    data=st.lists(
        st.lists(
            st.integers(min_value=-8, max_value=8).map(lambda v: v / 4.0),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None)
def test_pca_power_iteration_matches_python_trajectory(spark, data):
    assume(any(any(x != 0 for x in v) for v in data))
    from lynx_spark.operators.similarity import power_iteration_pca

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    rows = power_iteration_pca(df, "vec_id", "embedding", n_iters=3).collect()
    got = {r["dim"]: (r["loading"], r["explained_ratio"]) for r in rows}
    exp_load, exp_ratio = _pca_python(data, n_iters=3)
    assert sorted(got) == [1, 2, 3]
    for i in range(3):
        lo, ra = got[i + 1]
        assert lo == pytest.approx(exp_load[i], abs=1e-9), (i, lo, exp_load)
        assert ra == pytest.approx(exp_ratio, abs=1e-9)


def test_pca_rank_one_recovery(spark):
    """On exactly rank-1 data the dominant direction IS the data
    direction: explained ratio ~1 and loadings proportional to it."""
    from lynx_spark.operators.similarity import power_iteration_pca

    base = [0.6, -0.8, 0.0]
    df = spark.createDataFrame(
        [(i, [c * x for x in base]) for i, c in enumerate([1.0, -2.0, 3.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = power_iteration_pca(df, "vec_id", "embedding", n_iters=3).collect()
    load = [r["loading"] for r in sorted(rows, key=lambda r: r["dim"])]
    ratio = rows[0]["explained_ratio"]
    assert ratio == pytest.approx(1.0, abs=1e-4)
    # sign convention: all-positive start vector -> aligned with +base
    # up to the iterate's own sign dynamics; compare |cosine|
    dot = sum(a * b for a, b in zip(load, base))
    na = math.sqrt(sum(a * a for a in load))
    assert abs(dot) / na == pytest.approx(1.0, abs=1e-4)


# ----------------------------------------------------- q256 isotonic PAV


def _pav_python(bins: list[tuple[int, int, int]]) -> dict[int, float]:
    """Textbook pool-adjacent-violators on (s, n, pos) sorted by s —
    the POOLING algorithm, independent of the max-min formula the
    implementation uses."""
    blocks = [
        [s, float(n), float(pos)] for s, n, pos in sorted(bins)
    ]  # [min_s, weight, pos_sum]
    stack: list[list[float]] = []
    for b in blocks:
        stack.append(list(b))
        while (
            len(stack) >= 2
            and stack[-2][2] / stack[-2][1] >= stack[-1][2] / stack[-1][1]
        ):
            s2 = stack.pop()
            stack[-1][1] += s2[1]
            stack[-1][2] += s2[2]
    out: dict[int, float] = {}
    idx = 0
    for blk_i, blk in enumerate(stack):
        hi = stack[blk_i + 1][0] if blk_i + 1 < len(stack) else None
        rate = blk[2] / blk[1]
        while idx < len(blocks) and (hi is None or blocks[idx][0] < hi):
            out[int(blocks[idx][0])] = rate
            idx += 1
    return out


@given(
    bins=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),  # s
            st.integers(min_value=1, max_value=30),  # n
            st.integers(min_value=0, max_value=30),  # pos (clamped)
        ),
        min_size=2,
        max_size=10,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=10, deadline=None)
def test_isotonic_fit_matches_pooling_pav(spark, bins):
    bins = [(s, n, min(pos, n)) for s, n, pos in bins]
    from lynx_spark.plans.analytics import _isotonic_fit_rates

    g = spark.createDataFrame(bins, "s long, n long, pos long")
    rows = _isotonic_fit_rates(g).collect()
    fitted = {r["score_bin"]: r["fitted_rate"] for r in rows}
    raw = {r["score_bin"]: r["raw_rate"] for r in rows}
    exp = _pav_python(bins)
    assert sorted(fitted) == sorted(exp)
    for s, n, pos in bins:
        assert raw[s] == pytest.approx(pos / n, abs=2e-6)
        assert fitted[s] == pytest.approx(exp[s], abs=2e-6), (s, bins)
    # monotone non-decreasing in s — the defining isotonic property
    ordered = [fitted[s] for s in sorted(fitted)]
    assert all(a <= b + 1e-9 for a, b in zip(ordered, ordered[1:]))


# ------------------------------------------------------- q269 Platt fit


def _platt_python(bins: list[tuple[int, int, int]], n_iters: int = 3):
    """Pure-Python replica of the snapped Newton trajectory."""

    def p9_of(a9: int, b9: int, s: int) -> int:
        a = float(a9) / 1e9
        b = float(b9) / 1e9
        return int(
            math.floor(1.0 / (1.0 + math.exp(-(a * s + b))) * 1e9 + 0.5)
        )

    a9, b9 = 0, 0
    for _ in range(n_iters):
        g1 = g0 = h11 = h10 = h00 = 0
        for s, n, pos in bins:
            p9 = p9_of(a9, b9, s)
            w = n * p9 * (10**9 - p9)
            resid = pos * 10**9 - n * p9
            g1 += s * resid
            g0 += resid
            h11 += w * s * s
            h10 += w * s
            h00 += w
        g1d, g0d = float(g1) / 1e9, float(g0) / 1e9
        h11d, h10d, h00d = (
            float(h11) / 1e18,
            float(h10) / 1e18,
            float(h00) / 1e18,
        )
        det = h11d * h00d - h10d * h10d
        da = (h00d * g1d - h10d * g0d) / det
        db = (h11d * g0d - h10d * g1d) / det
        a9 = int(math.floor((float(a9) / 1e9 + da) * 1e9 + 0.5))
        b9 = int(math.floor((float(b9) / 1e9 + db) * 1e9 + 0.5))
    nd = sum(n for _, n, _ in bins)
    eb = sum(abs(s * n - 100 * pos) for s, n, pos in bins)
    ea = sum(
        abs(n * p9_of(a9, b9, s) - pos * 10**9) for s, n, pos in bins
    )
    return (
        a9 / 1e9,
        b9 / 1e9,
        math.floor(eb / (100.0 * nd) * 1e6 + 0.5) / 1e6,
        math.floor(ea / (1e9 * nd) * 1e6 + 0.5) / 1e6,
    )


@given(
    bins=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=3,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=10, deadline=None)
def test_platt_fit_matches_python_newton(spark, bins):
    bins = [(s, n, min(pos, n)) for s, n, pos in bins]
    # need at least two distinct score bins with nonzero curvature and
    # a non-degenerate mix of outcomes, else Newton's 2x2 is singular
    assume(len({s for s, _, _ in bins}) >= 2)
    try:
        exp = _platt_python(bins, n_iters=3)
    except (ZeroDivisionError, OverflowError):
        assume(False)
    assume(all(math.isfinite(x) for x in exp))
    from lynx_spark.plans.analytics import _platt_fit

    g = spark.createDataFrame(bins, "s long, n long, pos long")
    row = _platt_fit(g, n_iters=3).collect()[0]
    assert row["n_docs"] == sum(n for _, n, _ in bins)
    assert row["platt_a"] == pytest.approx(exp[0], abs=1e-5)
    assert row["platt_b"] == pytest.approx(exp[1], abs=1e-5)
    assert row["ece_before"] == pytest.approx(exp[2], abs=2e-6)
    assert row["ece_after"] == pytest.approx(exp[3], abs=2e-6)


# -------------------------------------------------------- q248 PACF


def _durbin_levinson(r: list[float], p: int) -> list[float]:
    """Generic Durbin-Levinson recursion: returns [phi_11, phi_22,
    ..., phi_pp] from autocorrelations r[0]=r_1..r[p-1]=r_p —
    independent of the hand-unrolled level-3 closed forms in q248."""
    phi = {}
    pacf = []
    for k in range(1, p + 1):
        if k == 1:
            kk = r[0]
        else:
            num = r[k - 1] - sum(
                phi[(k - 1, j)] * r[k - 1 - j] for j in range(1, k)
            )
            den = 1.0 - sum(
                phi[(k - 1, j)] * r[j - 1] for j in range(1, k)
            )
            kk = num / den
        phi[(k, k)] = kk
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - kk * phi[(k - 1, k - j)]
        pacf.append(kk)
    return pacf


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=400).map(lambda v: v / 4.0),
        min_size=9,
        max_size=18,
    )
)
@settings(max_examples=6, deadline=None)
def test_pacf_matches_generic_durbin_levinson(spark, vals, tmp_path_factory):
    assume(len(set(vals)) >= 3)  # non-constant series
    sf = str(tmp_path_factory.mktemp("pacf_sf"))
    rows = [
        (i, _day(i), 0, "x", v, None) for i, v in enumerate(vals)
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf}/events.parquet")

    # pure-Python twin of the published pipeline: cent-quantized day
    # sums, rounded mean, exact integer ACF numerators, 1e-6 snap
    y2 = [int(math.floor(v * 100.0 + 0.5)) for v in vals]
    n, s = len(y2), sum(y2)
    m2 = int(math.floor(float(s) / float(n) + 0.5))
    dev = [y - m2 for y in y2]
    den = sum(d * d for d in dev)
    assume(den > 0)
    r = []
    for lag in (1, 2, 3):
        num = sum(dev[i] * dev[i - lag] for i in range(lag, n))
        r.append(
            math.floor(float(num) / float(den) * 1e6 + 0.5) / 1e6
        )
    # keep the recursion well-conditioned (both sides divide by these)
    assume(abs(1.0 - r[0] * r[0]) > 1e-3)
    p22 = (r[1] - r[0] * r[0]) / (1.0 - r[0] * r[0])
    p21 = r[0] - p22 * r[0]
    assume(abs(1.0 - p21 * r[0] - p22 * r[1]) > 1e-3)
    exp = _durbin_levinson(r, 3)

    from lynx_spark.plans.analytics import REGISTRY

    got = {
        row["lag_days"]: (row["acf"], row["pacf"])
        for row in REGISTRY["q248_pacf"].fn(spark, sf).collect()
    }
    assert sorted(got) == [1, 2, 3]
    for k in (1, 2, 3):
        assert got[k][0] == pytest.approx(r[k - 1], abs=2e-6)
        assert got[k][1] == pytest.approx(exp[k - 1], abs=5e-6), (
            k,
            vals,
            r,
        )


# --------------------------------------------------- q266 Nelson-Aalen


@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # signup day
            st.one_of(
                st.none(), st.integers(min_value=0, max_value=10)
            ),  # days to purchase (None = censored)
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=8, deadline=None)
def test_nelson_aalen_matches_textbook_estimator(
    spark, users, tmp_path_factory
):
    assume(any(d is not None for _, d in users))
    sf = str(tmp_path_factory.mktemp("na_sf"))
    rows = []
    eid = 0
    for uid, (d0, delta) in enumerate(users):
        rows.append((eid, _day(d0), uid, "signup", 1.0, None))
        eid += 1
        if delta is not None:
            rows.append((eid, _day(d0 + delta), uid, "purchase", 1.0, None))
            eid += 1
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf}/events.parquet")

    # textbook Nelson-Aalen with ties on synthetic durations: evt=1
    # dur=delta; censored dur = (max event day) - d0
    max_day = max(
        [d0 for d0, _ in users]
        + [d0 + d for d0, d in users if d is not None]
    )
    durs = [
        (d if d is not None else max_day - d0, 1 if d is not None else 0)
        for d0, d in users
    ]
    total = len(durs)
    grid = sorted({t for t, _ in durs})
    hcum = 0
    exp: dict[int, tuple[int, int, float]] = {}
    for t in grid:
        d_i = sum(1 for tt, e in durs if tt == t and e == 1)
        n_i = total - sum(1 for tt, _ in durs if tt < t)
        if d_i > 0:
            hcum += int(math.floor(float(d_i) / float(n_i) * 1e9 + 0.5))
            exp[t] = (
                n_i,
                d_i,
                math.floor(hcum / 1e3 + 0.5) / 1e6,
            )

    from lynx_spark.plans.analytics import REGISTRY

    got = {
        r["t_days"]: (r["n_at_risk"], r["n_events"], r["cum_hazard"])
        for r in REGISTRY["q266_nelson_aalen"].fn(spark, sf).collect()
    }
    assert sorted(got) == sorted(exp), (got, exp)
    for t, (n_i, d_i, h) in exp.items():
        assert got[t][0] == n_i, (t, got[t], exp[t])
        assert got[t][1] == d_i
        assert got[t][2] == pytest.approx(h, abs=1e-9)
