"""DuckDB-oracle correctness harness: replicates the driver's t2 gate
(SURVEY §5 strategy point 3). For every query with an oracle, run the
Spark implementation AND the DuckDB SQL on the same parquet and compare
row count, column names, and exact cell values (order-insensitive,
columns sorted by name).

SF dir via SPARK_GRAFT_TEST_SF_DIR (default sf0.001 for speed; the
driver gate runs sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR

from lynx_spark.plans.analytics import REGISTRY
from lynx_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # canonicalize IEEE -0.0: numerically equal,
            # string-unequal (see oracle_sweep._normalize)
        return v
    return v


def _rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(str(_normalize(row[i])) for i in order) for row in rows),
    )


ORACLE_QUERIES = list(REGISTRY)


def test_every_entry_is_oracled():
    """270/270-oracled invariant (r13, VERDICT r12 task 7): the q()
    decorator rejects oracle-less registrations at import, so the
    rows-only tier and its permanently-skipped parametrize are gone.
    This assertion is the suite-side witness."""
    missing = [n for n, s in REGISTRY.items() if not s.oracle]
    assert not missing, f"registry entries without an oracle: {missing}"


def _assert_driver_canonicalizable(name, schema):
    """Registry-wide guard for the driver's pandas canonicalizer
    (sort_values over every column, then a value hash). Two output
    shapes are proven hazards (CORRECTNESS_r06): top-level
    array/map/struct columns throw `unhashable type: 'list'` before
    any comparison happens (q129), and DECIMAL values beyond int64
    can hash-mismatch even when both engines agree bit-for-bit
    (q123). Binary columns are banned for the same sortability
    reason. Offenders must render a scalar form — concat_ws ↔
    array_to_string for arrays, a STRING cast for wide decimals —
    identically in engine and oracle."""
    from pyspark.sql import types as sty

    for field in schema.fields:
        dt = field.dataType
        assert not isinstance(
            dt, (sty.ArrayType, sty.MapType, sty.StructType, sty.BinaryType)
        ), (
            f"{name}.{field.name}: top-level {dt.simpleString()} column "
            "breaks the driver canonicalizer — render it as a scalar "
            "(e.g. concat_ws) in BOTH engine and oracle"
        )
        if isinstance(dt, sty.DecimalType):
            assert dt.precision <= 18, (
                f"{name}.{field.name}: {dt.simpleString()} can exceed "
                "int64 — cast to STRING (or split sub-int64) both sides"
            )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, ddb, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    _assert_driver_canonicalizable(name, sdf.schema)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    rel = ddb.sql(spec.oracle)
    dcols = list(rel.columns)
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    sset = _rowset(scols, srows)
    dset = _rowset(dcols, drows)
    if sset != dset:
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


