"""Hand-case tests for the round-10 registry cohort (q216, q229,
q230, q232, q234, q236, q239, q242, q243, q244):
each query runs on a tiny purpose-built parquet fixture and is
checked against an independent python replay of the same math —
the mini-fixture discipline of test_round8/9_ops, so the DuckDB
oracle is never the only witness."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lynx_spark.plans.analytics import REGISTRY


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, 'YYYY-MM-DD HH:MM:SS', user_id, type, value)"""
    df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source, n_chars)"""
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, name, tmp_path):
    return REGISTRY[name].fn(spark, str(tmp_path)).collect()


def test_q229_psi_hand(spark, tmp_path):
    # first half: values in bins 0 and 1; second half: bins 1 and 9
    rows = [
        (1, "2024-01-02 00:00:00", 1, "click", 10.0),   # bin 0, A
        (2, "2024-01-03 00:00:00", 1, "click", 70.0),   # bin 1, A
        (3, "2024-01-20 00:00:00", 2, "click", 80.0),   # bin 1, B
        (4, "2024-01-21 00:00:00", 2, "click", 599.0),  # bin 9, B
        (5, "2024-01-22 00:00:00", 2, "click", 9999.0), # clamps to 9, B
    ]
    _write_events(spark, tmp_path, rows)
    got = {r["bin"]: r for r in _run(spark, "q229_psi_drift", tmp_path)}
    assert len(got) == 10  # every bin materializes (zero-cell roster)
    na = Counter([0, 1])
    nb = Counter([1, 9, 9])
    ta, tb = 2, 3
    for b in range(10):
        pa = (na.get(b, 0) + 1) / (ta + 10)
        pb = (nb.get(b, 0) + 1) / (tb + 10)
        want = math.floor((pa - pb) * math.log(pa / pb) * 1e6 + 0.5) / 1e6
        assert got[b]["n_a"] == na.get(b, 0)
        assert got[b]["n_b"] == nb.get(b, 0)
        assert got[b]["psi_contrib"] == pytest.approx(want, abs=0), b


def test_q230_ohlc_tie_break(spark, tmp_path):
    # two events at the SAME timestamp: event_id breaks the tie
    rows = [
        (1, "2024-01-05 09:00:00", 1, "click", 5.00),
        (2, "2024-01-05 09:00:00", 1, "click", 7.00),
        (3, "2024-01-05 12:00:00", 1, "click", 1.00),
        (4, "2024-01-05 23:00:00", 2, "click", 3.00),
        (5, "2024-01-05 10:00:00", 1, "view", 9.00),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        (str(r["day"]), r["event_type"]): r
        for r in _run(spark, "q230_ohlc_bars", tmp_path)
    }
    bar = got[("2024-01-05", "click")]
    assert bar["open"] == 5.00   # event_id 1 before 2 at equal ts
    assert bar["high"] == 7.00
    assert bar["low"] == 1.00
    assert bar["close"] == 3.00
    assert bar["n_events"] == 4
    v = got[("2024-01-05", "view")]
    assert (v["open"], v["close"], v["n_events"]) == (9.0, 9.0, 1)


def test_q232_anova_hand(spark, tmp_path):
    xs = {"a": [100, 200, 300], "b": [400, 500, 600, 700]}
    rows = []
    i = 0
    for s, vals in xs.items():
        for v in vals:
            rows.append((i, "w " * 3, "en", s, v))
            i += 1
    _write_docs(spark, tmp_path, rows)
    [r] = _run(spark, "q232_anova_f", tmp_path)
    allv = [v for vs in xs.values() for v in vs]
    n, k = len(allv), len(xs)
    st = sum(
        math.floor(sum(vs) ** 2 / len(vs) + 0.5) for vs in xs.values()
    )
    ssb = st - sum(allv) ** 2 / n
    ssw = sum(v * v for v in allv) - st
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k_groups"] == k and r["n_docs"] == n
    assert r["f_stat"] == math.floor(f * 1e6 + 0.5) / 1e6


def test_q234_ccf_lag_identity(spark, tmp_path):
    # purchase revenue = click revenue shifted one day -> ccf(1) = 1
    rows = []
    eid = 0
    series = [10.0, 40.0, 20.0, 80.0, 30.0, 60.0]
    for d, v in enumerate(series, start=1):
        rows.append((eid, f"2024-01-{d:02d} 01:00:00", 1, "click", v))
        eid += 1
    for d, v in enumerate(series, start=2):
        rows.append((eid, f"2024-01-{d:02d} 01:00:00", 1, "purchase", v))
        eid += 1
    _write_events(spark, tmp_path, rows)
    got = {r["lag"]: r for r in _run(spark, "q234_ccf_lagged", tmp_path)}
    assert got[1]["ccf"] == 1.0
    assert got[1]["n_pairs"] == 6
    assert got[0]["ccf"] < 1.0


def test_q236_info_gain_hand(spark, tmp_path):
    # source 'a': all long docs; source 'b': half long -> gain > 0
    rows = (
        [(i, "x", "en", "a", 900) for i in range(4)]
        + [(10 + i, "x", "en", "b", 900) for i in range(2)]
        + [(20 + i, "x", "en", "b", 100) for i in range(2)]
    )
    _write_docs(spark, tmp_path, rows)
    [r] = _run(spark, "q236_info_gain", tmp_path)

    def h(p, n):
        if p in (0, n):
            return 0.0
        q = p / n
        return -q * math.log(q) - (1 - q) * math.log(1 - q)

    hp6 = math.floor(h(6, 8) * 1e6 + 0.5)
    wh6 = 4 * math.floor(h(4, 4) * 1e6 + 0.5) + 4 * math.floor(
        h(2, 4) * 1e6 + 0.5
    )
    hc6 = math.floor(wh6 / 8 + 0.5)
    assert r["n_docs"] == 8 and r["n_sources"] == 2
    assert r["h_parent"] == hp6 / 1e6
    assert r["h_conditional"] == hc6 / 1e6
    assert r["info_gain"] == pytest.approx(hp6 / 1e6 - hc6 / 1e6, abs=1e-12)
    assert r["info_gain"] > 0


def test_q239_bootstrap_matches_python_replay(spark, tmp_path):
    days = [(f"2024-01-{d:02d}", v) for d, v in
            [(1, 10.0), (2, 40.0), (3, 20.0), (4, 80.0)]]
    rows = [
        (i, f"{day} 01:00:00", 1, "click", v)
        for i, (day, v) in enumerate(days)
    ]
    _write_events(spark, tmp_path, rows)
    [r] = _run(spark, "q239_bootstrap_ci", tmp_path)
    ys = [int(math.floor(v * 100 + 0.5)) for _, v in days]  # day order
    n = len(ys)
    means = []
    for b in range(1, 201):
        tot = 0
        for i in range(1, n + 1):
            h = int(
                hashlib.md5(f"bs-{b}-{i}".encode()).hexdigest()[:15], 16
            )
            tot += ys[h % n]  # idx = h % n + 1, 1-based -> list offset
        means.append(math.floor(tot / (n * 100.0) * 1e6 + 0.5))
    means.sort()
    assert r["b_resamples"] == 200 and r["n_days"] == n
    assert r["mean_lo"] == means[4] / 1e6
    assert r["mean_hi"] == means[194] / 1e6
    assert r["point_mean"] == math.floor(
        sum(ys) / (n * 100.0) * 1e6 + 0.5
    ) / 1e6


def test_q242_vocab_jaccard_hand(spark, tmp_path):
    rows = [
        (1, "a b c", "en", "s1", 5),
        (2, "b c d", "en", "s2", 5),
        (3, "x y", "en", "s3", 3),
        (4, "c d", "en", "s2", 3),  # dup words within source collapse
    ]
    _write_docs(spark, tmp_path, rows)
    got = {
        (r["s1"], r["s2"]): r
        for r in _run(spark, "q242_source_vocab_jaccard", tmp_path)
    }
    # vocab: s1={a,b,c} s2={b,c,d} s3={x,y}
    r12 = got[("s1", "s2")]
    assert r12["n_inter"] == 2
    assert (r12["n_vocab_1"], r12["n_vocab_2"]) == (3, 3)
    assert r12["jaccard"] == 0.5
    assert ("s1", "s3") not in got  # disjoint pairs emit nothing
    assert ("s2", "s3") not in got


def test_q243_heaps_hand(spark, tmp_path):
    corpora = {"s1": "a b a b", "s2": "a b c d e f", "s3": "a a a"}
    rows = [
        (i, t, "en", s, len(t)) for i, (s, t) in enumerate(corpora.items())
    ]
    _write_docs(spark, tmp_path, rows)
    [r] = _run(spark, "q243_heaps_law", tmp_path)
    pts = []
    for t in corpora.values():
        w = t.split()
        pts.append(
            (
                math.floor(math.log(len(w)) * 1e6 + 0.5),
                math.floor(math.log(len(set(w))) * 1e6 + 0.5),
            )
        )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lnk6 = math.floor((sy / n - beta * (sx / n)) + 0.5)
    assert r["n_sources"] == 3
    assert r["heaps_beta"] == math.floor(beta * 1e6 + 0.5) / 1e6
    assert r["heaps_ln_k"] == lnk6 / 1e6


def test_q244_seasonal_decompose_hand(spark, tmp_path):
    # 14 consecutive days, value = 100*d dollars: linear trend, so
    # trend(MA7) == y on interior days and every residual+seasonal
    # pair reconstructs the detrended zero
    rows = [
        (d, f"2024-01-{d:02d} 01:00:00", 1, "click", float(d))
        for d in range(1, 15)
    ]
    _write_events(spark, tmp_path, rows)
    out = _run(spark, "q244_seasonal_decompose", tmp_path)
    days = {str(r["day"]): r for r in out}
    # only full-window days survive: 4..11
    assert sorted(days) == [f"2024-01-{d:02d}" for d in range(4, 12)]
    for d in range(4, 12):
        r = days[f"2024-01-{d:02d}"]
        assert r["revenue"] == float(d)
        assert r["trend"] == float(d)  # centered MA of a line
        # additive identity on the snapped grids
        assert r["revenue"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["residual"], abs=1e-9
        )
