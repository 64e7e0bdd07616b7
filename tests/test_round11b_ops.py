"""Round-11 second-batch operator tests: independent hand replays for
the new entries, against reference implementations that share NO code
(and no formulation) with either the Spark operators or the DuckDB
oracles — the r10/r11 convention that caught the q251 shared-grid bug
oracle agreement alone could not see.

q256 isotonic: the engine computes PAV through the minimax identity
fitted(i) = max_{j<=i} min_{k>=i} mean(j..k); the replay runs the
classic stack-based pool-adjacent-violators algorithm on the SAME
per-bin (n, pos) counts the query emits, so any error in the
minimax device (off-by-one in the cumulative window, wrong join
inequality) shows up as a pool mismatch.

q257 WOE/IV: replayed in plain Python floats from the raw parquet.

q259 conformal: replayed with hashlib-md5 splits + numpy from the raw
parquet, including the nearest-rank quantile index arithmetic.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from tests.conftest import SF_DIR

from lynx_spark.plans.analytics import REGISTRY


def _pav_stack(levels):
    """Classic PAV: pool adjacent violators with weighted means.
    levels = list of (n, pos) ordered by score; returns fitted rate
    per input level."""
    # each block: [sum_pos, sum_n, span]
    blocks: list[list[float]] = []
    for n, pos in levels:
        blocks.append([pos, n, 1])
        while (
            len(blocks) >= 2
            and blocks[-2][0] * blocks[-1][1]
            >= blocks[-1][0] * blocks[-2][1]  # prev mean >= cur mean
        ):
            p2, n2, s2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
            blocks[-1][2] += s2
    out: list[float] = []
    for pos, n, span in blocks:
        out.extend([pos / n] * span)
    return out


def test_q256_isotonic_matches_stack_pav(spark):
    rows = (
        REGISTRY["q256_isotonic_calibration"]
        .fn(spark, SF_DIR)
        .collect()
    )
    rows = sorted(rows, key=lambda r: r["score_bin"])
    fitted = _pav_stack([(r["n_docs"], r["n_pos"]) for r in rows])
    for r, f in zip(rows, fitted):
        assert r["fitted_rate"] == pytest.approx(f, abs=1.1e-6), (
            r["score_bin"],
            f,
        )
    # monotone non-decreasing — the whole point of the fit
    fr = [r["fitted_rate"] for r in rows]
    assert all(a <= b for a, b in zip(fr, fr[1:]))
    # calibration is mass-preserving: sum n*fitted == sum pos
    tot_fit = sum(r["n_docs"] * r["fitted_rate"] for r in rows)
    tot_pos = sum(r["n_pos"] for r in rows)
    assert tot_fit == pytest.approx(tot_pos, rel=1e-4)


def test_q257_woe_iv_python_replay(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    out = {
        (r["feature"], r["bucket"]): r
        for r in REGISTRY["q257_woe_iv"].fn(spark, SF_DIR).collect()
    }
    y = (docs["lang"] == "en").astype(int)
    feats = {
        "source": docs["source"],
        "len_bucket": docs["n_chars"]
        .floordiv(100)
        .clip(upper=9)
        .astype(int)
        .astype(str),
    }
    for fname, col in feats.items():
        g = pd.DataFrame({"b": col, "y": y}).groupby("b")["y"]
        P = int(y.sum())
        Q = int(len(y) - P)
        iv = 0.0
        woes = {}
        for b, grp in g:
            p_b, n_b = int(grp.sum()), int(grp.count())
            q_b = n_b - p_b
            woe = math.log((p_b + 0.5) / P) - math.log((q_b + 0.5) / Q)
            woes[b] = woe
            iv += (p_b / P - q_b / Q) * woe
        for b, woe in woes.items():
            r = out[(fname, b)]
            assert r["woe"] == pytest.approx(woe, abs=1.1e-6)
            assert r["iv"] == pytest.approx(iv, abs=2e-6)


def test_q259_conformal_python_replay(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    out = {
        r["event_type"]: r
        for r in REGISTRY["q259_conformal_coverage"].fn(spark, SF_DIR).collect()
    }
    ev = ev[ev["value"].notna()].copy()
    ev["v2"] = (ev["value"] * 100.0 + 0.5).apply(math.floor)
    ev["bucket"] = ev["event_id"].apply(
        lambda i: int(
            hashlib.md5(f"conf-{i}".encode()).hexdigest()[:15], 16
        )
        % 5
    )
    for et, grp in ev.groupby("event_type"):
        tr = grp[grp["bucket"] <= 2]
        cal = grp[grp["bucket"] == 3]
        te = grp[grp["bucket"] == 4]
        pred = tr["v2"].sum() / len(tr)
        res = sorted((cal["v2"] - pred).abs())
        k = min(math.ceil(0.9 * (len(res) + 1)), len(res))
        q_hat = res[k - 1]
        cov = float(((te["v2"] - pred).abs() <= q_hat).mean())
        r = out[et]
        assert r["n_train"] == len(tr)
        assert r["n_cal"] == len(cal)
        assert r["n_test"] == len(te)
        assert r["pred_mean"] == pytest.approx(pred, abs=1.1e-6)
        assert r["q_hat"] == pytest.approx(q_hat, abs=1.1e-6)
        assert r["coverage"] == pytest.approx(cov, abs=1.1e-6)
        # the distribution-free guarantee, loosely: coverage in a
        # generous band around the 0.9 nominal at test-SF sizes
        assert 0.75 <= r["coverage"] <= 1.0


def test_q260_two_nn_numpy_replay(spark):
    import numpy as np

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    x6 = np.array(
        [
            [math.floor(v * 1e6 + 0.5) for v in e]
            for e in emb["embedding"]
        ],
        dtype=np.int64,
    )
    ids = emb["vec_id"].to_numpy()
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(f"id-{ids[i]}".encode()).hexdigest(),
            ids[i],
        ),
    )[:64]
    s = 0.0
    used = 0
    for i in order:
        d2 = ((x6 - x6[i]) ** 2).sum(axis=1)
        cand = sorted(
            (int(d), int(n)) for d, n in zip(d2, ids) if d > 0
        )
        d1, d2b = cand[0][0], cand[1][0]
        s += round(0.5 * math.log(d2b / d1), 9)
        used += 1
    row = (
        REGISTRY["q260_intrinsic_dimension"].fn(spark, SF_DIR).collect()[0]
    )
    assert row["n_probes"] == used
    assert row["sum_ln_mu"] == pytest.approx(s, abs=1.1e-6)
    assert row["id_hat"] == pytest.approx(used / s, abs=1.1e-6)
    # embeddings are synthetic ~64-dim noise + cluster structure:
    # the estimate must be positive and far below the ambient dim
    assert 0 < row["id_hat"] < 64


def test_q261_periodogram_matches_numpy_fft(spark):
    import numpy as np

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    x = (
        ev.groupby(ev["ts"].dt.date)
        .size()
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    n = len(x)
    spec = np.fft.rfft(x - x.mean())
    rows = {
        r["k"]: r
        for r in REGISTRY["q261_periodogram"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == set(range(1, min(10, (n - 1) // 2) + 1))
    for k, r in rows.items():
        assert r["n_days"] == n
        assert r["period_days"] == pytest.approx(n / k, abs=1.1e-6)
        # snapped-cos grid vs true FFT: relative agreement
        assert r["power"] == pytest.approx(
            abs(spec[k]) ** 2, rel=1e-4, abs=1e-3
        )
    peaks = [k for k, r in rows.items() if r["is_peak"]]
    true_peak = max(rows, key=lambda k: abs(spec[k]) ** 2)
    assert peaks == [true_peak]


def test_q255_bfs_hand_graph(spark):
    """bfs_hops semantics on a planted directed graph (the kNN build
    feeding q255 is already oracled via q83): a 2-chain, a branch, a
    cycle back to the seed, and an unreachable island."""
    from lynx_spark.operators.graph import bfs_hops

    #  1 -> 2 -> 3 -> 1 (cycle), 2 -> 4, 4 -> 5, 6 -> 7 (island)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 4), (4, 5), (6, 7)],
        ["src", "nbr"],
    )
    seeds = spark.createDataFrame([(1,), (6,)], ["vec_id"])
    rows = {
        (r["seed_id"], r["hop"]): r["n_nodes"]
        for r in bfs_hops(edges, seeds, "vec_id", max_hops=4).collect()
    }
    # seed 1: hop0={1} hop1={2} hop2={3,4} hop3={5} (1 revisited,
    # kept at hop 0 — min-hop semantics)
    assert rows[(1, 0)] == 1
    assert rows[(1, 1)] == 1
    assert rows[(1, 2)] == 2
    assert rows[(1, 3)] == 1
    assert (1, 4) not in rows
    # seed 6: hop0={6} hop1={7}, frontier then empties (early stop)
    assert rows[(6, 0)] == 1
    assert rows[(6, 1)] == 1
    assert (6, 2) not in rows


def test_q258_textrank_python_replay(spark, tmp_path):
    """TextRank on a planted corpus vs an independent dict-based
    power iteration (no shared ids, no shared recurrence code)."""
    import os

    texts = [
        "alpha bravo charlie alpha bravo",
        "bravo charlie delta echo",
        "echo alpha charlie bravo alpha",
        "zz yy",  # short words drop out entirely
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = {
        r["word"]: (r["score"], r["rank"])
        for r in REGISTRY["q258_textrank_keywords"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    # independent replay
    from collections import Counter, defaultdict

    w_edges = Counter()
    vocab = set()
    for t in texts:
        fw = [w for w in t.split() if len(w) >= 4]
        vocab.update(fw)
        for x, y_ in zip(fw, fw[1:]):
            if x != y_:
                w_edges[(min(x, y_), max(x, y_))] += 1
    adj = defaultdict(dict)
    for (u, v), w in w_edges.items():
        adj[u][v] = adj[u].get(v, 0) + w
        adj[v][u] = adj[v].get(u, 0) + w
    n = len(vocab)
    r = {w: 1.0 / n for w in vocab}
    for _ in range(3):
        contrib = defaultdict(float)
        for u, nbrs in adj.items():
            wout = sum(nbrs.values())
            for v, w in nbrs.items():
                # mirror the engine's 1e-12 contribution snap
                contrib[v] += math.floor(
                    (r[u] * w / wout) * 1e12 + 0.5
                ) / 1e12
        r = {
            w: 0.15 / n + 0.85 * contrib.get(w, 0.0) for w in vocab
        }
    expect = sorted(
        ((math.floor(s * 1e8 + 0.5) / 1e8, w) for w, s in r.items()),
        key=lambda t_: (-t_[0], t_[1]),
    )
    assert len(out) == min(20, n)
    for rank, (score, word) in enumerate(expect[:20], start=1):
        assert out[word][1] == rank, (word, out[word], rank)
        assert out[word][0] == pytest.approx(score, abs=2e-8)


def test_q262_group_kfold_invariants(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = REGISTRY["q262_group_kfold"].fn(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    assert sum(r["sum_chars"] for r in rows) == int(docs["n_chars"].sum())
    assert all(0 <= r["fold"] <= 4 for r in rows)
    # the whole point: a group split never separates a near-dup pair
    assert all(r["group_split_pairs"] == 0 for r in rows)
    # and the naive per-doc split does (planted dup clusters exist
    # at every test SF), which is the leakage this op prevents
    assert rows[0]["naive_split_pairs"] > 0
    # fold sizes roughly balanced (md5-uniform over clusters)
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) < 2.5 * max(1, min(sizes))


def test_q263_clustering_agreement_sklearn_free_replay(spark):
    import numpy as np

    from lynx_spark.operators.similarity import HYPERPLANES

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.array([list(e) for e in emb["embedding"]], dtype=np.float64)
    planes = np.array(HYPERPLANES[0], dtype=np.float64)
    bits = (X @ planes.T) > 0
    cl = (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1)
    lb = emb["label"].to_numpy()
    # independent contingency-based metrics
    from collections import Counter

    nij = Counter(zip(cl, lb))
    ai = Counter(cl)
    bj = Counter(lb)
    n = len(lb)

    def c2(x):
        return x * (x - 1) // 2

    s_ij = sum(c2(v) for v in nij.values())
    s_a = sum(c2(v) for v in ai.values())
    s_b = sum(c2(v) for v in bj.values())
    exp_idx = s_a * s_b / c2(n)
    ari = (s_ij - exp_idx) / ((s_a + s_b) / 2 - exp_idx)
    purity = sum(
        max(v for (c, L), v in nij.items() if c == cu) for cu in ai
    ) / n
    i_uv = sum(
        round((v / n) * math.log(n * v / (ai[c] * bj[L])), 9)
        for (c, L), v in nij.items()
    )
    h_u = sum(round(-(v / n) * math.log(v / n), 9) for v in ai.values())
    h_v = sum(round(-(v / n) * math.log(v / n), 9) for v in bj.values())
    nmi = i_uv / math.sqrt(h_u * h_v)
    row = (
        REGISTRY["q263_clustering_agreement"].fn(spark, SF_DIR).collect()[0]
    )
    assert row["n_vectors"] == n
    assert row["n_clusters"] == len(ai)
    assert row["n_labels"] == len(bj)
    assert row["purity"] == pytest.approx(purity, abs=1.1e-6)
    assert row["ari"] == pytest.approx(ari, abs=1.1e-6)
    assert row["nmi"] == pytest.approx(nmi, abs=1.1e-6)
    # agreement metrics live in sane ranges
    assert -1.0 <= row["ari"] <= 1.0 and 0.0 <= row["nmi"] <= 1.0


def test_q264_hodges_lehmann_brute_force_replay(spark):
    import numpy as np

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev["value"].notna()]
    out = {
        r["event_type"]: r
        for r in REGISTRY["q264_hodges_lehmann"].fn(spark, SF_DIR).collect()
    }
    for et, grp in ev.groupby("event_type"):
        v = np.array(
            [math.floor(x + 0.5) for x in grp["value"]], dtype=np.int64
        )
        # brute-force Walsh sums over i <= j on the raw rows
        s = (v[:, None] + v[None, :])[
            np.triu_indices(len(v), k=0)
        ]
        s.sort()
        W = len(s)
        k = math.ceil(W / 2)
        hl = s[k - 1] / 2.0
        r = out[et]
        assert r["n_events"] == len(v)
        assert r["hl_estimate"] == hl
        assert r["mean_value"] == pytest.approx(v.mean(), abs=1.1e-6)


def test_q265_bh_fdr_reference_replay(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = REGISTRY["q265_bh_fdr"].fn(spark, SF_DIR).collect()
    g = docs.groupby("source").agg(
        n_s=("lang", "size"), p_s=("lang", lambda s: int((s == "en").sum()))
    )
    nn, pp, m = int(g["n_s"].sum()), int(g["p_s"].sum()), len(g)

    def anderson_p(z):
        az = abs(z)
        t = 1.0 / (1.0 + 0.2316419 * az)
        poly = t * (
            0.319381530
            + t
            * (
                -0.356563782
                + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
            )
        )
        return 2.0 * (math.exp(-(az * az) / 2.0) / math.sqrt(2 * math.pi) * poly)

    ps = {}
    for src, r in g.iterrows():
        n_s, p_s = int(r["n_s"]), int(r["p_s"])
        ph = pp / nn
        z = (p_s / n_s - (pp - p_s) / (nn - n_s)) / math.sqrt(
            ph * (1 - ph) * (1 / n_s + 1 / (nn - n_s))
        )
        ps[src] = (z, math.floor(anderson_p(z) * 1e9 + 0.5) / 1e9)
    # the A&S polynomial itself tracks the true normal tail to ~1e-7
    for z, p in ps.values():
        true_p = math.erfc(abs(z) / math.sqrt(2))
        assert p == pytest.approx(true_p, abs=2e-7)
    # independent BH step-up
    order = sorted(ps, key=lambda s: (ps[s][1], s))
    kstar = 0
    for i, src in enumerate(order, start=1):
        if ps[src][1] <= i / m * 0.10:
            kstar = i
    byrank = {r["bh_rank"]: r for r in rows}
    assert len(byrank) == m
    for i, src in enumerate(order, start=1):
        r = byrank[i]
        assert r["source"] == src
        assert r["z"] == pytest.approx(ps[src][0], abs=1.1e-6)
        assert r["p_value"] == pytest.approx(ps[src][1], abs=1.1e-9)
        assert r["rejected"] == (i <= kstar)


def test_q266_nelson_aalen_python_replay(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    rows = {
        r["t_days"]: r
        for r in REGISTRY["q266_nelson_aalen"].fn(spark, SF_DIR).collect()
    }
    maxd = ev["ts"].max().date()
    durs = []
    for uid, grp in ev.groupby("user_id"):
        sg = grp[grp["event_type"] == "signup"]
        if sg.empty:
            continue
        t0 = sg["ts"].min()
        pu = grp[(grp["event_type"] == "purchase") & (grp["ts"] >= t0)]
        if pu.empty:
            durs.append(((maxd - t0.date()).days, 0))
        else:
            durs.append(((pu["ts"].min().date() - t0.date()).days, 1))
    from collections import Counter

    c_all = Counter(t for t, _ in durs)
    d_i = Counter(t for t, e in durs if e)
    total = len(durs)
    h9 = 0
    seen = 0
    for t in sorted(c_all):
        n_risk = total - seen
        seen += c_all[t]
        if d_i.get(t, 0) == 0:
            continue
        h9 += math.floor(d_i[t] / n_risk * 1e9 + 0.5)
        r = rows[t]
        assert r["n_at_risk"] == n_risk
        assert r["n_events"] == d_i[t]
        assert r["cum_hazard"] == pytest.approx(h9 / 1e9, abs=1.1e-6)
        assert r["na_survival"] == pytest.approx(
            math.exp(-h9 / 1e9), abs=1.1e-6
        )
    assert set(rows) == {t for t in d_i}


def test_q267_q22_shape_pandas_replay(spark):
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    sel = cust[
        cust["c_mktsegment"].isin(["BUILDING", "MACHINERY", "AUTOMOBILE"])
    ].copy()
    sel["bal2"] = (sel["c_acctbal"] * 100.0 + 0.5).apply(math.floor)
    pos = sel[sel["bal2"] > 0]
    cutoff = pos["bal2"].sum() / len(pos)
    recent = set(
        orders[orders["o_orderdate"] >= pd.Timestamp("2000-01-01")][
            "o_custkey"
        ]
    )
    idle = sel[(sel["bal2"] > cutoff) & (~sel["c_custkey"].isin(recent))]
    rows = {
        r["c_mktsegment"]: r
        for r in REGISTRY["q267_idle_balance_blame"].fn(spark, SF_DIR).collect()
    }
    g = idle.groupby("c_mktsegment")["bal2"]
    assert set(rows) == set(g.groups)
    assert len(rows) > 0  # the dormancy cutoff keeps the set non-trivial
    for seg, grp in g:
        assert rows[seg]["n_customers"] == len(grp)
        assert rows[seg]["total_acctbal"] == pytest.approx(
            grp.sum() / 100.0, abs=0.011
        )


def test_q268_mase_pandas_replay(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    rows = {
        r["event_type"]: r
        for r in REGISTRY["q268_mase_backtest"].fn(spark, SF_DIR).collect()
    }
    for et, grp in ev.groupby("event_type"):
        y = grp.groupby(grp["ts"].dt.date).size().sort_index().to_list()
        ae_m = [abs(y[t] - y[t - 7]) for t in range(7, len(y))]
        ae_n = [abs(y[t] - y[t - 1]) for t in range(7, len(y))]
        smape = [
            round(2.0 * abs(y[t] - y[t - 7]) / (y[t] + y[t - 7]), 9)
            for t in range(7, len(y))
        ]
        r = rows[et]
        assert r["n_eval"] == len(ae_m)
        assert r["mae_model"] == pytest.approx(
            sum(ae_m) / len(ae_m), abs=1.1e-6
        )
        assert r["mase"] == pytest.approx(
            sum(ae_m) / sum(ae_n), abs=1.1e-6
        )
        assert r["smape"] == pytest.approx(
            sum(smape) / len(smape), abs=1.1e-6
        )


def test_q269_platt_newton_trajectory_replay(spark):
    # rebuild the score-grain histogram from the oracled q84 scores
    # + the q119 label, replay the snapped Newton trajectory in pure
    # python, and require the identical (a, b) and ECEs
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    scores = {
        r["doc_id"]: r["quality_prob"]
        for r in REGISTRY["q84_quality_classifier"].fn(spark, SF_DIR).collect()
    }
    from collections import Counter

    n_c, pos_c = Counter(), Counter()
    for _, row in docs.iterrows():
        s = min(math.floor(scores[row["doc_id"]] * 100.0 + 0.5), 100)
        n_c[s] += 1
        pos_c[s] += 1 if row["n_chars"] >= 280 else 0
    a9 = b9 = 0
    for _ in range(3):
        a, b = a9 / 1e9, b9 / 1e9
        g1 = g0 = h11 = h10 = h00 = 0
        for s in n_c:
            p9 = math.floor(
                1.0 / (1.0 + math.exp(-(a * s + b))) * 1e9 + 0.5
            )
            resid = pos_c[s] * 10**9 - n_c[s] * p9
            w = n_c[s] * p9 * (10**9 - p9)
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
        a9 = math.floor((a9 / 1e9 + da) * 1e9 + 0.5)
        b9 = math.floor((b9 / 1e9 + db) * 1e9 + 0.5)
    a, b = a9 / 1e9, b9 / 1e9
    nd = sum(n_c.values())
    eb = sum(abs(s * n_c[s] - 100 * pos_c[s]) for s in n_c) / (100 * nd)
    ea = sum(
        abs(
            n_c[s]
            * math.floor(1.0 / (1.0 + math.exp(-(a * s + b))) * 1e9 + 0.5)
            - pos_c[s] * 10**9
        )
        for s in n_c
    ) / (1e9 * nd)
    row = REGISTRY["q269_platt_scaling"].fn(spark, SF_DIR).collect()[0]
    assert row["n_docs"] == nd
    assert row["platt_a"] == pytest.approx(a, abs=1e-9)
    assert row["platt_b"] == pytest.approx(b, abs=1e-9)
    assert row["ece_before"] == pytest.approx(eb, abs=1.1e-6)
    assert row["ece_after"] == pytest.approx(ea, abs=1.1e-6)
    # the fit must actually calibrate: the 3-step trajectory lands
    # near the converged MLE (50 unsnapped Newton steps) and the
    # weighted calibration error shrinks. NOTE the converged slope is
    # NEGATIVE on this corpus — the q84 quality score anti-correlates
    # with the n_chars>=280 label (q202's gap column shows the same
    # miscalibration); a sign assumption here would be a data
    # assumption, not a correctness property.
    ac, bc = 0.0, 0.0
    for _ in range(50):
        g1 = g0 = h11 = h10 = h00 = 0.0
        for s in n_c:
            p = 1.0 / (1.0 + math.exp(-(ac * s + bc)))
            g1 += s * (pos_c[s] - n_c[s] * p)
            g0 += pos_c[s] - n_c[s] * p
            w = n_c[s] * p * (1 - p)
            h11 += w * s * s
            h10 += w * s
            h00 += w
        det = h11 * h00 - h10 * h10
        ac += (h00 * g1 - h10 * g0) / det
        bc += (h11 * g0 - h10 * g1) / det
    assert abs(row["platt_a"] - ac) < 0.25 * abs(ac)
    assert row["ece_after"] <= row["ece_before"]


def test_q270_matching_att_pandas_replay(spark):
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    orders["cents"] = (orders["o_totalprice"] * 100.0 + 0.5).apply(
        math.floor
    )
    sp = orders.groupby("o_custkey").agg(
        spend=("cents", "sum"), cnt=("cents", "size")
    )
    cu = cust.set_index("c_custkey").join(sp, how="left")
    cu["cnt"] = cu["cnt"].fillna(0).astype(int)
    cu["spend"] = cu["spend"].fillna(0).astype(int)
    cu["treated"] = cu["c_mktsegment"] == "BUILDING"
    tg = cu[cu["treated"]].groupby("cnt").agg(
        t_n=("spend", "size"), t_sp=("spend", "sum")
    )
    cg = cu[~cu["treated"]].groupby("cnt").agg(
        c_n=("spend", "size"), c_sp=("spend", "sum")
    )
    c6 = 0
    for cnt, r in tg.iterrows():
        best = min(cg.index, key=lambda c: (abs(cnt - c), c))
        c6 += math.floor(
            r["t_n"] * (cg.loc[best, "c_sp"] / cg.loc[best, "c_n"]) * 1e6
            + 0.5
        )
    nt, tsp = int(tg["t_n"].sum()), int(tg["t_sp"].sum())
    nc, csp = int(cg["c_n"].sum()), int(cg["c_sp"].sum())
    att = (tsp / nt - (c6 / 1e6) / nt) / 100.0
    naive = (tsp / nt - csp / nc) / 100.0
    row = REGISTRY["q270_matching_att"].fn(spark, SF_DIR).collect()[0]
    assert row["n_treated"] == nt and row["n_controls"] == nc
    assert row["att_dollars"] == pytest.approx(att, abs=1.1e-6)
    assert row["naive_diff_dollars"] == pytest.approx(naive, abs=1.1e-6)


def test_q271_kruskal_wallis_rankdata_replay(spark):
    import numpy as np

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["x"] = (ev["value"] * 100.0 + 0.5).apply(math.floor)
    # per-row average ranks via argsort (no value-grain device)
    x = ev["x"].to_numpy()
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=float)
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and x[order[j + 1]] == x[order[i]]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    ev["rank"] = ranks
    n = len(ev)
    rss = sum(
        round(grp["rank"].sum() ** 2 / len(grp), 6)
        for _, grp in ev.groupby("event_type")
    )
    h_raw = 12.0 / (n * (n + 1)) * rss - 3.0 * (n + 1)
    _, t_counts = np.unique(x, return_counts=True)
    tie = 1.0 - sum(int(t) ** 3 - int(t) for t in t_counts) / (
        n**3 - n
    )
    rows = {
        r["event_type"]: r
        for r in REGISTRY["q271_kruskal_wallis"].fn(spark, SF_DIR).collect()
    }
    for et, grp in ev.groupby("event_type"):
        r = rows[et]
        assert r["n_events"] == len(grp)
        assert r["mean_rank"] == pytest.approx(
            grp["rank"].mean(), abs=1.1e-6
        )
        assert r["h_statistic"] == pytest.approx(h_raw, abs=2e-6)
        assert r["h_tie_corrected"] == pytest.approx(
            h_raw / tie, abs=2e-6
        )


def test_q272_cuped_pandas_replay(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["v2"] = (ev["value"] * 100.0 + 0.5).apply(math.floor)
    split = pd.Timestamp("2024-01-16")
    pop = set(ev[ev["ts"] < split]["user_id"])
    pur = ev[ev["event_type"] == "purchase"]
    px = pur[pur["ts"] < split].groupby("user_id")["v2"].sum()
    py = pur[pur["ts"] >= split].groupby("user_id")["v2"].sum()
    xs = [float(px.get(u, 0)) for u in pop]
    ys = [float(py.get(u, 0)) for u in pop]
    n = len(pop)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum(a * b for a, b in zip(xs, ys)) / n - mx * my
    varx = sum(a * a for a in xs) / n - mx * mx
    vary = sum(b * b for b in ys) / n - my * my
    row = REGISTRY["q272_cuped_adjustment"].fn(spark, SF_DIR).collect()[0]
    assert row["n_users"] == n
    assert row["mean_post_dollars"] == pytest.approx(my / 100, abs=1.1e-6)
    assert row["theta"] == pytest.approx(cov / varx, abs=1.1e-6)
    assert row["var_post"] == pytest.approx(vary, rel=1e-9, abs=1.1e-6)
    assert row["var_cuped"] == pytest.approx(
        vary - cov * cov / varx, rel=1e-9, abs=1.1e-6
    )
    assert row["var_reduction_pct"] == pytest.approx(
        100 * cov * cov / (varx * vary), abs=1.1e-6
    )
    # CUPED never increases variance, and the reduction equals rho^2
    assert 0 <= row["var_cuped"] <= row["var_post"]
    assert 0 <= row["var_reduction_pct"] <= 100
