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

SFD = "/root/testdata/sf0.001"


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


# ---------------------------------------------------------------------
# round-11 cohort hand replays (the test_round10b_ops pattern): tiny
# explicit fixtures, python replays of the math, known-answer checks
# ---------------------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, 'YYYY-MM-DD HH:MM:SS', user_id, type, value)"""
    df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source)"""
    spark.createDataFrame(
        [(d, t, lg, s, len(t)) for d, t, lg, s in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_q245_mann_whitney_python_replay(spark, tmp_path):
    """MW-U with tied midranks replayed in python on a tiny corpus."""
    rows = [
        (1, "a" * 5, "en", "s"),
        (2, "b" * 7, "en", "s"),
        (3, "c" * 7, "de", "s"),
        (4, "d" * 9, "de", "s"),
        (5, "e" * 11, "de", "s"),
        (6, "f" * 5, "de", "s"),
    ]
    _write_docs(spark, tmp_path, rows)
    out = REGISTRY["q245_mann_whitney_u"].fn(spark, str(tmp_path)).first()
    import math

    xs = [(5, 1), (7, 1), (7, 0), (9, 0), (11, 0), (5, 0)]
    svals = sorted(x for x, _ in xs)
    rank = {}
    i = 0
    while i < len(svals):
        j = i
        while j < len(svals) and svals[j] == svals[i]:
            j += 1
        rank[svals[i]] = (i + 1 + j) / 2.0  # midrank of the tie block
        i = j
    r1 = sum(rank[x] for x, g in xs if g)
    n1 = sum(1 for _, g in xs if g)
    n = len(xs)
    n2 = n - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    from collections import Counter

    ties = sum(c**3 - c for c in Counter(x for x, _ in xs).values())
    var = n1 * n2 * ((n + 1) * n * (n - 1) - ties) / (12.0 * n * (n - 1))
    z = (2.0 * u1 - n1 * n2) / (2.0 * math.sqrt(var))
    assert out["n_en"] == 2 and out["n_other"] == 4
    assert out["u_statistic"] == pytest.approx(u1, abs=1e-9)
    assert out["z"] == pytest.approx(z, abs=2e-6)


def test_q246_jarque_bera_python_replay(spark, tmp_path):
    vals = [1.0, 2.0, 2.0, 3.0, 10.0, 4.0, 2.5, 3.5]
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", v)
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["q246_jarque_bera"].fn(spark, str(tmp_path)).first()
    import math

    v = [round(x * 100) for x in vals]
    n = len(v)
    mu = sum(v) / n
    m2 = sum(x * x for x in v) / n - mu * mu
    m3 = (
        sum(x**3 for x in v) / n
        - 3 * mu * (sum(x * x for x in v) / n)
        + 2 * mu**3
    )
    m4 = (
        sum(x**4 for x in v) / n
        - 4 * mu * (sum(x**3 for x in v) / n)
        + 6 * mu * mu * (sum(x * x for x in v) / n)
        - 3 * mu**4
    )
    skew = m3 / (m2 * math.sqrt(m2))
    kurt = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    assert out["n_events"] == n
    assert out["skewness"] == pytest.approx(skew, abs=2e-6)
    assert out["ex_kurtosis"] == pytest.approx(kurt, abs=2e-6)
    assert out["jb_stat"] == pytest.approx(jb, abs=2e-6)


def test_q247_brown_forsythe_python_replay(spark, tmp_path):
    ga = [1.0, 2.0, 3.0, 4.0, 100.0]  # wild variance
    gb = [5.0, 5.1, 5.2, 4.9, 5.0]  # tight
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", v)
        for i, v in enumerate(ga)
    ] + [
        (100 + i, f"2024-01-01 01:{i:02d}:00", 1, "error", v)
        for i, v in enumerate(gb)
    ]
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["q247_brown_forsythe"].fn(spark, str(tmp_path)).first()

    def lower_median(vs):
        s = sorted(vs)
        return s[(len(s) + 1) // 2 - 1]

    import math

    groups = [[round(x * 100) for x in ga], [round(x * 100) for x in gb]]
    zs = [[abs(v - lower_median(g)) for v in g] for g in groups]
    k = len(zs)
    n = sum(len(g) for g in zs)
    st = sum(
        math.floor(sum(g) * sum(g) / len(g) + 0.5) for g in zs
    )  # the t_g snap
    s = sum(sum(g) for g in zs)
    ssq = sum(x * x for g in zs for x in g)
    f = ((st - s * s / n) / (k - 1)) / ((ssq - st) / (n - k))
    assert out["k_groups"] == 2 and out["n_events"] == n
    assert out["bf_stat"] == pytest.approx(f, abs=2e-6)


def test_q248_pacf_durbin_levinson_consistency(spark):
    """PACF closed forms must equal a generic Durbin-Levinson run on
    the acf values the query itself returns (sf0.001 real data)."""
    rows = {
        int(r["lag_days"]): r
        for r in REGISTRY["q248_pacf"].fn(spark, SFD).collect()
    }
    assert set(rows) == {1, 2, 3}
    r = {k: rows[k]["acf"] for k in rows}
    phi = {(1, 1): r[1]}
    phi[(2, 2)] = (r[2] - r[1] * r[1]) / (1 - r[1] * r[1])
    phi[(2, 1)] = phi[(1, 1)] - phi[(2, 2)] * phi[(1, 1)]
    phi[(3, 3)] = (
        r[3] - phi[(2, 1)] * r[2] - phi[(2, 2)] * r[1]
    ) / (1 - phi[(2, 1)] * r[1] - phi[(2, 2)] * r[2])
    assert rows[1]["pacf"] == pytest.approx(phi[(1, 1)], abs=2e-6)
    assert rows[2]["pacf"] == pytest.approx(phi[(2, 2)], abs=2e-6)
    assert rows[3]["pacf"] == pytest.approx(phi[(3, 3)], abs=2e-6)


def test_q249_ab_lift_python_replay(spark, tmp_path):
    # users 1..8; conversion = >= 14 purchases. users 1,2,3 convert.
    rows = []
    eid = 0
    for u in range(1, 9):
        np = 15 if u <= 3 else 2
        for i in range(np):
            rows.append(
                (eid, f"2024-01-0{(i % 7) + 1} 0{u}:00:{i:02d}", u,
                 "purchase", 1.0)
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["q249_ab_test_lift"].fn(spark, str(tmp_path)).first()
    import hashlib
    import math

    def variant(u):
        return int(hashlib.md5(f"ab-{u}".encode()).hexdigest()[:15], 16) % 2

    conv = {u: 1 if u <= 3 else 0 for u in range(1, 9)}
    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    for u in range(1, 9):
        n[variant(u)] += 1
        c[variant(u)] += conv[u]
    assert (out["n_control"], out["n_treatment"]) == (n[0], n[1])
    assert (out["conv_control"], out["conv_treatment"]) == (c[0], c[1])
    p0, p1 = c[0] / n[0], c[1] / n[1]
    pp = (c[0] + c[1]) / (n[0] + n[1])
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / n[1] + 1 / n[0]))
    assert out["z"] == pytest.approx(z, abs=2e-6)
    if p0 > 0:
        assert out["lift"] == pytest.approx(p1 / p0 - 1, abs=2e-6)


def test_q250_leakage_brute_force_replay(spark, tmp_path):
    import hashlib
    import math
    import random

    rng = random.Random(7)
    vecs = {
        i: [rng.uniform(-0.5, 0.5) for _ in range(8)] for i in range(40)
    }
    # plant an exact cross-split near-dup: find one test and one train
    def is_test(i):
        return (
            int(hashlib.md5(f"leak-{i}".encode()).hexdigest()[:15], 16) % 5
            == 0
        )

    t_ids = [i for i in vecs if is_test(i)]
    n_ids = [i for i in vecs if not is_test(i)]
    assert t_ids and n_ids
    vecs[n_ids[0]] = list(vecs[t_ids[0]])  # exact duplicate across split
    spark.createDataFrame(
        [(i, v, 0) for i, v in vecs.items()],
        "vec_id long, embedding array<double>, label long",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r["qid"]: r
        for r in REGISTRY["q250_embedding_leakage"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == set(t_ids)  # < 64 test vecs -> all are probes

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for q in t_ids:
        best = max(
            ((round(cos(vecs[q], vecs[nn]), 5), -nn) for nn in n_ids),
        )
        assert out[q]["max_cos"] == pytest.approx(best[0], abs=1e-9)
        assert out[q]["train_nid"] == -best[1]
    assert out[t_ids[0]]["is_leak"] == 1  # the planted duplicate
    assert out[t_ids[0]]["max_cos"] == pytest.approx(1.0, abs=1e-4)


def test_q251_pca_matches_numpy_eigendecomposition(spark, tmp_path):
    """Planted anisotropy (a dominant direction with a real spectral
    gap — power iteration needs one; the near-isotropic synthetic
    testdata has none, which the oracle still covers exactly): 3
    iterations must align with numpy's top eigenvector and the
    explained-energy ratio with lambda1/trace."""
    import numpy as np

    rng = np.random.default_rng(11)
    d = 16
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    emb = rng.normal(scale=0.05, size=(300, d)) + np.outer(
        rng.normal(scale=0.4, size=300), u
    )
    emb = np.round(emb, 6)
    spark.createDataFrame(
        [(i, [float(x) for x in emb[i]], 0) for i in range(len(emb))],
        "vec_id long, embedding array<double>, label long",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    rows = (
        REGISTRY["q251_pca_power_iteration"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    v = np.array(
        [r["loading"] for r in sorted(rows, key=lambda r: r["dim"])]
    )
    er = rows[0]["explained_ratio"]
    g = emb.T @ emb
    evals, evecs = np.linalg.eigh(g)
    top = evecs[:, -1]
    assert abs(float(np.dot(v, top))) / float(np.linalg.norm(v)) > 0.99
    assert er == pytest.approx(float(evals[-1] / np.trace(g)), abs=0.01)
    assert float(np.linalg.norm(v)) == pytest.approx(1.0, abs=1e-3)


def test_q252_assortativity_hand_graph(spark, tmp_path, monkeypatch):
    """Known tiny graph: monkeypatch knn_graph to a fixed edge set so
    reciprocity and in-degree Pearson are hand-checkable."""
    import lynx_spark.operators.similarity as simmod
    from lynx_spark.plans import analytics as an

    edges = [(1, 2), (2, 1), (3, 1), (4, 1), (4, 3)]

    def fake_knn(df, id_col, vec_col, k=5, max_bucket=200):
        return df.sparkSession.createDataFrame(
            [(s, d, 1.0) for s, d in edges], "src long, nbr long, cos_sim double"
        )

    monkeypatch.setattr(an.sim, "knn_graph", fake_knn)
    spark.createDataFrame(
        [(i, [0.0], 0) for i in range(1, 5)],
        "vec_id long, embedding array<double>, label long",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = REGISTRY["q252_knn_assortativity"].fn(spark, str(tmp_path)).first()
    # indeg: 1->3, 2->1, 3->1, 4->0 ; reciprocal: (1,2) and (2,1)
    assert out["n_edges"] == 5 and out["n_reciprocal"] == 2
    assert out["reciprocity"] == pytest.approx(0.4, abs=1e-9)
    import math

    xy = [(3, 1), (1, 3), (1, 3), (0, 3), (0, 1)]
    ne = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    r = (ne * sxy - sx * sy) / math.sqrt(
        (ne * sxx - sx * sx) * (ne * syy - sy * sy)
    )
    assert out["assortativity"] == pytest.approx(r, abs=2e-6)


def test_q253_interval_overlap_hand_case(spark, tmp_path):
    rows = [
        # user 1: one purchase burst Jan 1-3, one error burst Jan 2-4
        (1, "2024-01-01 00:00:00", 1, "purchase", 1.0),
        (2, "2024-01-03 00:00:00", 1, "purchase", 1.0),
        (3, "2024-01-02 00:00:00", 1, "error", 1.0),
        (4, "2024-01-04 00:00:00", 1, "error", 1.0),
        # user 1: a second, distant purchase burst (gap > 48h) that
        # does NOT overlap any error burst
        (5, "2024-01-20 00:00:00", 1, "purchase", 1.0),
        # user 2: error burst only -> no output row
        (6, "2024-01-01 00:00:00", 2, "error", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["user_id"]: r
        for r in REGISTRY["q253_interval_overlap_join"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {1}
    assert out[1]["n_overlaps"] == 1
    assert out[1]["overlap_us"] == 24 * 3600 * 1_000_000  # Jan2->Jan3


def test_q254_waiting_orders_hand_case(spark, tmp_path):
    orders = [(1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-01")]
    li = [
        # order 1: suppliers 10 (late) and 11 (on time) -> blame 10
        (1, 10, "2024-06-01"),
        (1, 11, "2024-01-15"),
        # order 2: both suppliers late -> nobody singled out
        (2, 10, "2024-06-01"),
        (2, 11, "2024-06-01"),
        # order 3: single-supplier order, late -> excluded (n_supp < 2)
        (3, 12, "2024-06-01"),
    ]
    spark.createDataFrame(
        [
            (o, 1, "F", 1.0, d, "1-URGENT")
            for o, d in orders
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [
            (o, 1, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
            for o, s, d in li
        ],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn(
        "l_shipdate", F.col("l_shipdate").cast("timestamp")
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(10, "Supplier#10", 0, 0.0), (11, "Supplier#11", 0, 0.0),
         (12, "Supplier#12", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long,"
        " s_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    out = REGISTRY["q254_waiting_orders"].fn(spark, str(tmp_path)).collect()
    assert [(r["s_name"], r["n_blamed"]) for r in out] == [
        ("Supplier#10", 1)
    ]
