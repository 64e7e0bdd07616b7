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
