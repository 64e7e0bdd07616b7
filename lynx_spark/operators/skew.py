"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew automatically; these helpers cover the two cases AQE cannot:

- ``salted_agg``: a groupBy where ONE key holds a large share of all
  rows. A plain hash-agg sends that key's whole partition to one
  reducer. Salting splits each key into ``num_salts`` subkeys for a
  first partial aggregation, then a cheap second aggregation over
  ``num_salts`` rows per key merges the partials. Works for any
  algebraic aggregate (sum/count/min/max here).
- ``salted_broadcast_join``: joining a skewed fact key against a small
  dimension: replicate the dimension ``num_salts`` times (it is small
  — that is why it broadcasts) and give each fact row a random salt,
  so the skewed key's rows spread over ``num_salts`` tasks.

The salt must be DETERMINISTIC per row: a nondeterministic salt (e.g.
from monotonically_increasing_id or rand) feeding a shuffle breaks
correctness under partial task recomputation — when a lost map task is
re-run after a fetch failure, its rows would re-salt differently while
surviving reducers keep the old fetched partials (the SPARK-23207
correctness class). We derive the salt from the row's own content
(hash of all columns), so recomputation reproduces identical salts.
Rows with fully identical content share a salt — skew then remains
only if one literal row value dominates, which salting cannot help
anyway (documented limitation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, num_salts: int) -> Column:
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(num_salts))


def salted_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation; returns one row per key with
    sum/count/min/max/avg of value_col (aliased ``total/n/vmin/vmax/
    vavg``). Phase 1 shuffles on (key, salt) — the hot key spreads
    over num_salts reducers; phase 2 shuffles num_salts rows per key."""
    partial = (
        df.withColumn("_salt", _salt(df, num_salts))
        .groupBy(key_col, "_salt")
        .agg(
            F.sum(value_col).alias("_sum"),
            F.count(value_col).alias("_n"),
            F.min(value_col).alias("_min"),
            F.max(value_col).alias("_max"),
        )
    )
    return partial.groupBy(key_col).agg(
        F.sum("_sum").alias("total"),
        F.sum("_n").alias("n"),
        F.min("_min").alias("vmin"),
        F.max("_max").alias("vmax"),
        (F.sum("_sum") / F.sum("_n")).alias("vavg"),
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_salts: int = 16,
) -> DataFrame:
    """Skew-safe fact⋈dim: the small side is replicated num_salts
    times and broadcast; each fact row picks one replica, spreading a
    hot key's rows across tasks. Row multiplicity is unchanged (each
    fact row matches exactly its salt's replica)."""
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    salted_fact = fact.withColumn("_salt", _salt(fact, num_salts))
    return salted_fact.join(
        F.broadcast(salted_dim),
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
    ).drop("_salt")
