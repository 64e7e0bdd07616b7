from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from lynx_spark.session import get_spark

    spark = get_spark("lynx_spark_tests", shuffle_partitions=8)
    # perturbation hook for robustness sweeps: comma-separated
    # runtime confs, e.g. "spark.sql.adaptive.enabled=false" runs
    # the whole oracle suite with AQE off (different physical plans,
    # identical results required)
    extra = os.environ.get("SPARK_GRAFT_TEST_EXTRA_CONF", "")
    for kv in filter(None, extra.split(",")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())
    yield spark


@pytest.fixture()
def engine(spark, tmp_path):
    from lynx_spark.engine import LynxEngine

    return LynxEngine(spark, tmp_path / "wal", max_segment_size=1024 * 1024)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
