"""The two-phase distributed ranking device must be BIT-IDENTICAL to
the SinglePartition window it replaces — exactness is the whole deal
(q174/q177/q179/q181's oracles keep the literal window form). Checked
against Spark's own global windows on adversarial value distributions:
heavy ties (bucket-boundary ties included), n < k, and a single-value
column (zero usable breakpoints)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lynx_spark.operators import ranking as rnk


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(7)


DISTS = {
    "unique": list(range(100)),
    "heavy_ties": [i % 7 for i in range(100)],
    "one_value": [42] * 50,
    "skewed": [0] * 80 + list(range(1, 21)),
    "tiny": [3, 1, 2],
}


@pytest.mark.parametrize("dist", DISTS)
@pytest.mark.parametrize("ascending", [True, False])
def test_global_row_number_matches_window(spark, dist, ascending):
    df = _df(spark, DISTS[dist])
    order = (F.asc("v") if ascending else F.desc("v"), F.asc("id"))
    expected = df.withColumn(
        "grank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    got = rnk.global_row_number(
        df, "v", ascending=ascending, tie_cols=["id"], n_buckets=8
    )
    assert sorted(got.collect()) == sorted(expected.collect())


@pytest.mark.parametrize("dist", DISTS)
@pytest.mark.parametrize("k", [3, 10, 64])
def test_global_ntile_matches_window(spark, dist, k):
    df = _df(spark, DISTS[dist])
    expected = df.withColumn(
        "tile",
        F.ntile(k).over(Window.orderBy(F.desc("v"), F.asc("id"))),
    )
    got = rnk.global_ntile(
        df, "v", k, ascending=False, tie_cols=["id"], n_buckets=8
    )
    assert sorted(got.collect()) == sorted(expected.collect())


@pytest.mark.parametrize("dist", DISTS)
def test_global_running_sum_matches_window(spark, dist):
    df = _df(spark, DISTS[dist]).withColumn(
        "w", (F.col("id") * 13 + 7).cast("long")
    )
    expected = df.withColumn(
        "cum",
        F.sum("w")
        .over(
            Window.orderBy(F.desc("v"), F.asc("id")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long"),
    )
    got = rnk.global_running_sum(
        df, "v", "w", ascending=False, tie_cols=["id"], n_buckets=8
    )
    assert sorted(got.collect()) == sorted(expected.collect())


def test_no_single_partition_exchange_in_device_plan(spark):
    # the device's reason to exist: the data-sized window is
    # partitioned by bucket, and offsets fold into literals — the
    # plan carries NO SinglePartition exchange at all
    df = _df(spark, DISTS["unique"])
    plan = (
        rnk.global_ntile(df, "v", 5, tie_cols=["id"], n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(_bkt" in plan

@pytest.mark.parametrize("dist", DISTS)
def test_persist_input_bit_identical(spark, dist):
    # the r9 knob changes caching only, never values
    df = _df(spark, DISTS[dist])
    base = rnk.global_ntile(
        df, "v", 5, tie_cols=["id"], n_buckets=8
    )
    cached = rnk.global_ntile(
        df, "v", 5, tie_cols=["id"], n_buckets=8, persist_input=True
    )
    assert sorted(cached.collect()) == sorted(base.collect())


def test_persist_input_chained_calls_read_cache(spark):
    # the q177 chaining hazard the knob closes: with persist_input,
    # the LIVE plan of call N (cached subtrees stripped) is exactly
    # one bucket window over one InMemoryTableScan — call N's scalar
    # collects and window pass never re-run call N-1's lineage
    from tests.test_plans import live_plan

    df = _df(spark, DISTS["skewed"])
    s = rnk.global_ntile(
        df, "v", 5, tie_cols=["id"], out_col="t1",
        n_buckets=8, persist_input=True,
    )
    s = rnk.global_ntile(
        s, "id", 5, tie_cols=["v"], out_col="t2",
        n_buckets=8, persist_input=True,
    )
    plan = s._jdf.queryExecution().executedPlan().toString()
    live = live_plan(plan)
    assert live.count("InMemoryTableScan") == 1
    assert live.count("windowspecdefinition(_bkt") == 1
    assert live.count("row_number") == 1
    assert "Exchange SinglePartition" not in live

@pytest.mark.parametrize("dist", DISTS)
def test_global_ntile_multi_matches_windows(spark, dist):
    # the r10 multi-spec device must be bit-identical to applying the
    # literal global ntile windows per spec — including under heavy
    # ties, n < k, and a single-value column
    df = _df(spark, DISTS[dist]).withColumn(
        "w", (F.col("id") * 13 + 7) % 11
    )
    expected = df.withColumn(
        "t1", F.ntile(5).over(Window.orderBy(F.desc("v"), F.asc("id")))
    ).withColumn(
        "t2", F.ntile(3).over(Window.orderBy(F.asc("w"), F.asc("id")))
    )
    got = rnk.global_ntile_multi(
        df,
        [
            dict(value_col="v", k=5, ascending=False,
                 tie_cols=["id"], out_col="t1"),
            dict(value_col="w", k=3, tie_cols=["id"], out_col="t2"),
        ],
        n_buckets=8,
    )
    assert sorted(got.collect()) == sorted(expected.collect())


def test_global_ntile_multi_persist_single_cache(spark):
    # one device call = one live cache read feeding every window; the
    # input's own lineage never re-runs after the two scalar jobs
    from tests.test_plans import live_plan

    df = _df(spark, DISTS["skewed"])
    s = rnk.global_ntile_multi(
        df,
        [
            dict(value_col="v", k=5, tie_cols=["id"], out_col="t1"),
            dict(value_col="id", k=4, tie_cols=["v"], out_col="t2"),
            dict(value_col="v", k=3, ascending=False,
                 tie_cols=["id"], out_col="t3"),
        ],
        n_buckets=8,
        persist_input=True,
    )
    plan = s._jdf.queryExecution().executedPlan().toString()
    live = live_plan(plan)
    assert live.count("InMemoryTableScan") == 1
    assert live.count("row_number") == 3  # three pipelined windows
    assert "Exchange SinglePartition" not in live
    assert "Scan ExistingRDD" not in live
