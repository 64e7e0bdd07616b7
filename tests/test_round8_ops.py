"""Hand-verified cases for the round-8 operators: directional
containment, PMI collocations, temperature mixture weights, exact
percentile rank targets, systematic sampling — each checked against
values computed by hand (or a trivially-correct python reimplementation)
on frames small enough to inspect."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lynx_spark.operators import dedup as dd
from lynx_spark.operators import lm
from lynx_spark.operators import ranking as rnk


def test_containment_quote_inclusion(spark):
    # doc 1 is quoted verbatim inside doc 2: every 3-shingle of doc 1
    # appears in doc 2 → containment(1→2) = 1.0; the reverse direction
    # is |∩|/|S(2)| < 0.8 and must NOT appear. Jaccard would be
    # 3/12 = 0.25 — the case the operator exists for.
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "one two three the quick brown fox jumps four five six "
                "seven eight nine"),
            (3, "completely unrelated words here now"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["src_id"], r["dst_id"]): r
        for r in dd.containment_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    }
    assert (1, 2) in rows
    assert rows[(1, 2)]["containment"] == 1.0
    assert rows[(1, 2)]["n_common"] == 3  # 3 shingles in a 5-word doc
    assert (2, 1) not in rows
    assert not any(3 in k for k in rows)


def test_pmi_hand_computed(spark):
    # corpus: "a b" ×6 adjacent occurrences, unigram/bigram totals
    # computed by hand; engine must reproduce ln((n_ab·N²)/(N_bi·n_a·n_b))
    docs = spark.createDataFrame(
        [(i, "a b") for i in range(6)] + [(10, "c d c d c d c d c d")],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in lm.pmi_collocations(
            docs, "doc_id", "text", min_count=5, top_k=10
        ).collect()
    }
    # unigrams: a=6 b=6 c=5 d=5 → N=22; bigrams: (a,b)=6, (c,d)=5,
    # (d,c)=4 → N_bi = 6*1 + 9 = 15
    n_uni, n_bi = 22, 15
    exp_ab = round(math.log((6 * n_uni * n_uni) / (n_bi * 6 * 6)), 6)
    exp_cd = round(math.log((5 * n_uni * n_uni) / (n_bi * 5 * 5)), 6)
    assert out[("a", "b")]["n_ab"] == 6
    assert abs(out[("a", "b")]["pmi"] - exp_ab) < 1e-9
    assert abs(out[("c", "d")]["pmi"] - exp_cd) < 1e-9
    assert ("d", "c") not in out  # count 4 < min_count


def test_exact_percentile_rank_arithmetic():
    # percentile_disc target rank = ceil(p·n/100) via pure ints
    assert (100 * 50 + 99) // 100 == 50
    assert (101 * 50 + 99) // 100 == 51  # ceil(50.5)
    assert (1500 * 99 + 99) // 100 == 1485
    assert (3 * 90 + 99) // 100 == 3  # tiny n clamps to max rank


def test_systematic_sample_ranks(spark):
    # 200 distinct values desc → sampled ranks are exactly 1, 98, 195
    df = spark.createDataFrame(
        [(i, 1000 - i) for i in range(200)], "id long, v long"
    )
    ranked = rnk.global_row_number(
        df, "v", ascending=False, tie_cols=["id"], n_buckets=8, out_col="rn"
    )
    got = sorted(
        r["rn"] for r in ranked.filter((F.col("rn") - 1) % 97 == 0).collect()
    )
    assert got == [1, 98, 195]


def test_temperature_mixture_flattens_shares(spark):
    # two sources at 80%/20% of tokens: α=0.3 must pull weights
    # toward uniform — the math the multilingual upsampling rule is
    # for. Weights computed by hand with the same 9dp rounding.
    from lynx_spark.plans.analytics import REGISTRY
    import tempfile, os

    docs = spark.createDataFrame(
        [(i, "w " * 8, "en", "big", 16) for i in range(10)]
        + [(100 + i, "w " * 2, "en", "small", 4) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["source"]: r
            for r in REGISTRY["q186_temperature_mixture"]
            .fn(spark, d)
            .collect()
        }
    # "w " * 8 → split yields 8 words + trailing '' trimmed: trim
    # removes the trailing space, so 8 tokens; small: 2 tokens
    tb, ts = 10 * 8, 10 * 2
    tot = tb + ts
    wb = round((tb / tot) ** 0.3, 9)
    ws = round((ts / tot) ** 0.3, 9)
    z = wb + ws
    assert out["big"]["n_tokens"] == tb
    assert out["small"]["n_tokens"] == ts
    assert abs(out["big"]["temp_weight"] - round(wb / z, 6)) < 1e-9
    assert abs(out["small"]["temp_weight"] - round(ws / z, 6)) < 1e-9
    # flattening: natural share 0.8 → temp weight well below 0.8
    assert out["big"]["temp_weight"] < 0.7


def _tmp_docs(spark, rows, d):
    import os

    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))


def test_auc_matches_bruteforce_pair_count(spark):
    # exact AUC == the O(n²) Mann-Whitney pair count (pos>neg scores
    # + half-credit ties) over the engine's own (prob, label) rows —
    # the trivially-correct reimplementation of the statistic the
    # histogram form must reproduce
    import math
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY
    from lynx_spark.operators import quality as ql

    rows = [
        (i, " ".join(f"w{j % (i % 7 + 2)}" for j in range(4 + i % 9)),
         "en", "s", 250 + 5 * i)
        for i in range(24)
    ]
    with tempfile.TemporaryDirectory() as d:
        _tmp_docs(spark, rows, d)
        out = REGISTRY["q190_roc_auc"].fn(spark, d).collect()[0]
        docs = spark.read.parquet(f"{d}/documents.parquet")
        scored = {
            r["doc_id"]: r["quality_prob"]
            for r in ql.classifier_scores(docs, "doc_id", "text").collect()
        }
    pts = [(scored[r[0]], 1 if r[4] >= 280 else 0) for r in rows]
    pos = [p for p, y in pts if y == 1]
    neg = [p for p, y in pts if y == 0]
    num = sum(
        1.0 if pp > pn else (0.5 if pp == pn else 0.0)
        for pp in pos
        for pn in neg
    )
    expected = math.floor(num / (len(pos) * len(neg)) * 1e6 + 0.5) / 1e6
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    assert out["auc"] == expected


def test_heavy_hitters_exact_and_superset(spark):
    # an item above n/k must appear with its EXACT count; items below
    # must not — regardless of how the stream is partitioned (the MG
    # candidate pass runs per partition; correctness may not depend
    # on the partitioning)
    from lynx_spark.operators.quality import heavy_hitters_exact

    rows = (
        [("hot",)] * 300
        + [("warm",)] * 201
        + [("edge",)] * 200  # exactly n/k for k=5, n=1000 → excluded
        + [(f"cold{i}",) for i in range(299)]
    )
    assert len(rows) == 1000
    for parts in (1, 7, 32):
        items = spark.createDataFrame(rows, "word string").repartition(parts)
        got = {
            r["word"]: r["n_occurrences"]
            for r in heavy_hitters_exact(items, "word", k=5).collect()
        }
        assert got == {"hot": 300, "warm": 201}, parts


def test_decision_stump_matches_bruteforce(spark):
    # the value-grain Gini split search == brute force over every
    # candidate threshold on the engine's own (x, keep) rows
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY
    from lynx_spark.operators import quality as ql

    rows = [
        (i, " ".join(f"w{j % (i % 5 + 2)}" for j in range(3 + i % 11)),
         "en", "s", 100 + 17 * (i % 13))
        for i in range(40)
    ]
    with tempfile.TemporaryDirectory() as d:
        _tmp_docs(spark, rows, d)
        out = REGISTRY["q192_decision_stump"].fn(spark, d).collect()[0]
        docs = spark.read.parquet(f"{d}/documents.parquet")
        keep = {
            r["doc_id"]: 1 if r["keep"] else 0
            for r in ql.classifier_scores(docs, "doc_id", "text").collect()
        }
    pts = sorted((r[4], keep[r[0]]) for r in rows)
    xs = sorted({x for x, _ in pts})
    n, p = len(pts), sum(y for _, y in pts)
    best = None
    for t in xs[:-1]:
        nl = sum(1 for x, _ in pts if x <= t)
        lp = sum(y for x, y in pts if x <= t)
        nr, rp = n - nl, p - lp
        cost = round(
            (nl * nl - lp * lp - (nl - lp) * (nl - lp)) / nl
            + (nr * nr - rp * rp - (nr - rp) * (nr - rp)) / nr,
            9,
        )
        if best is None or (cost, t) < best:
            best = (cost, t)
    assert out["split_at"] == best[1]
    assert out["gini_cost"] == round(best[0], 6)


def test_flesch_hand_counted(spark):
    # "Hello world. How are you? Fine!" → 6 words, 3 sentences,
    # 9 vowel groups; formulas computed by hand
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY

    with tempfile.TemporaryDirectory() as d:
        _tmp_docs(
            spark,
            [(1, "Hello world. How are you? Fine!", "en", "s", 31)],
            d,
        )
        out = REGISTRY["q193_readability"].fn(spark, d).collect()[0]
    assert out["total_words"] == 6
    assert out["total_sentences"] == 3
    assert out["total_syllables"] == 9
    assert out["flesch_ease"] == round(
        206.835 - 1.015 * (6 / 3) - 84.6 * (9 / 6), 4
    )  # 77.905
    assert out["fk_grade"] == round(0.39 * 2 + 11.8 * 1.5 - 15.59, 4)


def test_chi_square_hand_case(spark):
    # 2x2 with margins 40/40: every expected cell is 20, every
    # contribution (30-20)²/20 = 5
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY

    rows = (
        [(i, "t", "en", "s1", 1) for i in range(30)]
        + [(100 + i, "t", "fr", "s1", 1) for i in range(10)]
        + [(200 + i, "t", "en", "s2", 1) for i in range(10)]
        + [(300 + i, "t", "fr", "s2", 1) for i in range(30)]
    )
    with tempfile.TemporaryDirectory() as d:
        _tmp_docs(spark, rows, d)
        out = {
            (r["source"], r["lang"]): r
            for r in REGISTRY["q194_chi_square"].fn(spark, d).collect()
        }
    assert len(out) == 4
    for (s, l), r in out.items():
        assert r["expected"] == 20.0
        assert r["chi2_contrib"] == 5.0
    assert out[("s1", "en")]["observed"] == 30
    assert out[("s2", "en")]["observed"] == 10


def test_attribution_hand_journey(spark):
    # user 1: click → view → purchase(10.00) → purchase(5.00): both
    # purchases credit 'view' (last non-purchase touch); user 2's
    # purchase has no prior touch → 'direct'
    import datetime as dt
    import os
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY

    t0 = dt.datetime(2024, 1, 1)
    ev = [
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "view", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 10.0, "{}"),
        (4, t0 + dt.timedelta(minutes=3), 1, "purchase", 5.0, "{}"),
        (5, t0, 2, "purchase", 7.5, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            ev,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r["channel"]: r
            for r in REGISTRY["q195_attribution"].fn(spark, d).collect()
        }
    assert out["view"]["n_conversions"] == 2
    assert out["view"]["revenue_cents"] == 1500
    assert out["direct"]["n_conversions"] == 1
    assert out["direct"]["revenue_cents"] == 750
    assert "click" not in out


def test_heldout_perplexity_matches_replay(spark):
    # exact replay of the add-1 unigram held-out perplexity in plain
    # python (same md5 split, same 1e-9 term rounding, same add-1
    # smoothing) on a small constructed corpus
    import hashlib
    import math
    import tempfile
    from collections import Counter
    from decimal import Decimal

    from lynx_spark.plans.analytics import REGISTRY

    rows = [
        (i, " ".join(f"tok{(i * 7 + j) % 13}" for j in range(6)),
         "en", "s", 40)
        for i in range(40)
    ]
    with tempfile.TemporaryDirectory() as d:
        _tmp_docs(spark, rows, d)
        out = REGISTRY["q196_heldout_perplexity"].fn(spark, d).collect()[0]

    def is_test(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[0] in "01"

    train, test = Counter(), Counter()
    for doc_id, text, *_ in rows:
        (test if is_test(doc_id) else train).update(text.split())
    n_train, vocab = sum(train.values()), len(train)
    # same ln(c+1)/ln(N+V) decomposition + 1e-9 term grid the engine
    # uses (so the vocabulary sum is order-free)
    sum_part = sum(
        (
            Decimal(str(round(m * math.log(train.get(w, 0) + 1), 9)))
            for w, m in test.items()
        ),
        Decimal(0),
    )
    n_test = sum(test.values())
    ce_raw = (
        n_test * math.log(n_train + vocab) - float(sum_part)
    ) / n_test
    assert out["n_train_tokens"] == n_train
    assert out["vocab_size"] == vocab
    assert out["n_test_tokens"] == n_test
    assert out["n_oov_tokens"] == sum(
        m for w, m in test.items() if w not in train
    )
    assert out["cross_entropy"] == round(ce_raw, 6)
    assert out["perplexity"] == round(math.exp(ce_raw), 4)
    # sanity: held-out ppl must sit between 1 and the uniform bound
    assert 1.0 < out["perplexity"] <= n_train + vocab


def test_curation_funnel_hand_stages(spark):
    # constructed corpus: docs 1/2 are byte-identical (exact dup →
    # 2 survives only as doc 1), docs 3/4 are near-dups (jaccard 1.0
    # on shared shingles → 4 dropped at stage 2), doc 5 is unique.
    # Stage 3 keeps whatever the classifier keeps — replayed from the
    # operator's own scores so the assertion is exact.
    import tempfile

    from lynx_spark.operators import quality as ql
    from lynx_spark.plans.analytics import REGISTRY

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, long_a, "en", "s", 10),
        (2, long_a, "en", "s", 10),  # exact dup of 1
        (3, "one two three four five six seven eight", "en", "s", 8),
        (4, "one two three four five six seven eight nine", "en", "s", 9),
        (5, "totally different words appear in this document", "en", "s", 7),
    ]
    with tempfile.TemporaryDirectory() as d:
        _tmp_docs(spark, rows, d)
        out = {
            r["stage"]: r
            for r in REGISTRY["q197_curation_funnel"].fn(spark, d).collect()
        }
        docs = spark.read.parquet(f"{d}/documents.parquet")
        kept = {
            r["doc_id"]
            for r in ql.classifier_scores(docs, "doc_id", "text")
            .filter("keep")
            .collect()
        }
    tokens = {r[0]: len(r[1].split()) for r in rows}
    assert out["0_raw"]["n_docs"] == 5
    assert out["0_raw"]["n_tokens"] == sum(tokens.values())
    # stage 1: doc 2 gone (min-id survivor of the md5 group)
    assert out["1_exact_dedup"]["n_docs"] == 4
    assert out["1_exact_dedup"]["n_tokens"] == sum(
        tokens[i] for i in (1, 3, 4, 5)
    )
    # stage 2: doc 4 is the larger id of the (3,4) near-dup pair
    assert out["2_near_dedup"]["n_docs"] == 3
    assert out["2_near_dedup"]["n_tokens"] == sum(
        tokens[i] for i in (1, 3, 5)
    )
    s3_expect = {1, 3, 5} & kept
    assert out["3_quality"]["n_docs"] == len(s3_expect)
    assert out["3_quality"]["n_tokens"] == sum(
        tokens[i] for i in s3_expect
    )


def test_trimmed_mean_hand_case(spark):
    # 196 uniform values + 4 extreme outliers; k = n/100 = 2 trims
    # exactly the 2 lowest and 2 highest ranks
    import os
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY

    vals = [100.0] * 196 + [0.01, 0.02, 9999.99, 9999.98]
    rows = [(i, v) for i, v in enumerate(vals)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double"
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = REGISTRY["q198_trimmed_mean"].fn(spark, d).collect()[0]
    cents = sorted(round(v * 100) for v in vals)
    assert out["n_total"] == 200 and out["n_dropped"] == 4
    assert out["mean_cents"] == round(sum(cents) / 200, 4)
    assert out["trimmed_mean_cents"] == round(
        sum(cents[2:-2]) / 196, 4
    )


def _tmp_orders(spark, rows, d):
    import os

    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).write.parquet(os.path.join(d, "orders.parquet"))


def test_mann_kendall_strict_trend(spark):
    # 10 strictly increasing monthly revenues: S = 45, no ties so
    # 18*Var = 10*9*25 = 2250, z = 44/sqrt(125) — hand arithmetic
    import datetime as dt
    import math
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY

    rows = [
        (i, 100.0 + 10.0 * i, dt.datetime(2024, 1 + i, 15))
        for i in range(10)
    ]
    with tempfile.TemporaryDirectory() as d:
        _tmp_orders(spark, rows, d)
        out = REGISTRY["q199_mann_kendall"].fn(spark, d).collect()[0]
    assert out["n_periods"] == 10
    assert out["s_stat"] == 45
    assert out["var18"] == 2250
    assert out["z_stat"] == round(44.0 / math.sqrt(2250.0 / 18.0), 6)
    assert out["trend"] == "increasing"


def test_theil_sen_ignores_outlier(spark):
    # 9 months on the exact line rev = 1000*x cents (one 10*x-dollar
    # order per month) plus one wild outlier month: the pairwise-
    # slope median stays exactly 1000, OLS does not
    import datetime as dt
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY

    rows = [
        (i, 10.0 * i, dt.datetime(2024, 1 + i, 15)) for i in range(9)
    ] + [(99, 99999.0, dt.datetime(2024, 10, 15))]
    with tempfile.TemporaryDirectory() as d:
        _tmp_orders(spark, rows, d)
        out = REGISTRY["q200_theil_sen"].fn(spark, d).collect()[0]
    assert out["n_pairs"] == 45
    assert out["theilsen_slope"] == 1000.0
    assert out["ols_slope"] != 1000.0


def test_wilson_interval_replay(spark):
    # replay the closed form in python from the engine's own counts;
    # interval must bracket the point rate and sit inside [0, 1]
    import math
    import tempfile

    from lynx_spark.plans.analytics import REGISTRY

    rows = [
        (i, " ".join(f"w{j % (i % 6 + 2)}" for j in range(3 + i % 9)),
         "en", "s", 50)
        for i in range(30)
    ]
    with tempfile.TemporaryDirectory() as d:
        _tmp_docs(spark, rows, d)
        out = REGISTRY["q201_wilson_interval"].fn(spark, d).collect()[0]
    n, k = out["n_docs"], out["n_keep"]
    ph = k / n
    z2, z = 3.8416, 1.96
    half = z * math.sqrt(ph * (1 - ph) / n + z2 / (4 * n * n))
    denom = 1 + z2 / n
    center = ph + z2 / (2 * n)
    assert out["keep_rate"] == round(ph, 6)
    assert out["wilson_lo"] == round((center - half) / denom, 6)
    assert out["wilson_hi"] == round((center + half) / denom, 6)
    assert 0.0 <= out["wilson_lo"] <= ph <= out["wilson_hi"] <= 1.0
