"""Data-layout optimization operators: Z-order (Morton) clustering
keys and the audit that measures how well a layout supports min/max
data skipping.

The reference engine (jdockerty/lynx) has no layout tier — its cold
path is a single parquet rewrite per flush. At 100 TB, multi-column
data skipping is the difference between scanning a file and pruning
it: sorting by a Z-order interleave of two quantized dimensions gives
every output file a small bounding box in BOTH dimensions, so
min/max zone maps (see q152) prune on either predicate column.
This is the OPTIMIZE ZORDER BY recipe from the Delta Lake /
Databricks literature, expressed as plain DataFrame arithmetic.

Cross-engine discipline (the DuckDB oracle replays the same math):
all quantization runs on exact integers — (x - min) * (2^bits - 1)
is an exact integer product, the division by the range is the same
IEEE double division in both engines, and floor of identical doubles
is identical. Bit extraction is shift/mask on BIGINT, exact
everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(bx: Column, by: Column, bits: int) -> Column:
    """Morton interleave of two ``bits``-wide non-negative integers:
    bit i of ``bx`` lands at position 2i+1, bit i of ``by`` at 2i.
    Unrolled shift/mask arithmetic — exact on BIGINT, and the oracle
    writes the identical expression."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftright(bx, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
        z = z + F.shiftright(by, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i)
        )
    return z


def zorder_audit(
    df: DataFrame,
    colx: str,
    coly: str,
    bits: int = 8,
    file_bits: int = 6,
) -> DataFrame:
    """Assign every row a Z-order file bucket and report, per bucket,
    its row count and bounding box in both dimensions plus the
    fraction of each dimension's global range the box spans — the
    skipping-effectiveness audit: small spans mean a predicate on
    EITHER column prunes most buckets.

    ``colx``/``coly`` must be integer-valued columns (callers convert
    dates to epoch days first). Each is min/max-normalized to
    ``bits`` bits, Morton-interleaved, and bucketed by the top
    ``file_bits`` bits of the Z-value — the 2^file_bits "files" an
    OPTIMIZE ZORDER rewrite would emit.

    Scale shape: one 4-scalar global aggregate (broadcast back), one
    projection, one bucket-granular aggregate. The audit never
    shuffles row data by bucket — partial aggregation reduces each
    partition to ≤2^file_bits rows before the exchange."""
    mx = 1 << bits
    stats = df.agg(
        F.min(colx).cast("long").alias("mnx"),
        F.max(colx).cast("long").alias("mxx"),
        F.min(coly).cast("long").alias("mny"),
        F.max(coly).cast("long").alias("mxy"),
    )
    j = df.crossJoin(F.broadcast(stats))
    bx = F.floor(
        ((F.col(colx).cast("long") - F.col("mnx")) * F.lit(mx - 1))
        / F.greatest(F.col("mxx") - F.col("mnx"), F.lit(1))
    )
    by = F.floor(
        ((F.col(coly).cast("long") - F.col("mny")) * F.lit(mx - 1))
        / F.greatest(F.col("mxy") - F.col("mny"), F.lit(1))
    )
    z = _interleave(bx, by, bits)
    keyed = j.select(
        F.shiftright(z, 2 * bits - file_bits).alias("file_id"),
        F.col(colx).cast("long").alias("x"),
        F.col(coly).cast("long").alias("y"),
        "mnx",
        "mxx",
        "mny",
        "mxy",
    )
    spanx = (F.max("x") - F.min("x")) / F.greatest(
        F.first("mxx") - F.first("mnx"), F.lit(1)
    ).cast("double")
    spany = (F.max("y") - F.min("y")) / F.greatest(
        F.first("mxy") - F.first("mny"), F.lit(1)
    ).cast("double")
    return keyed.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("x").cast("long").alias("min_x"),
        F.max("x").cast("long").alias("max_x"),
        F.min("y").cast("long").alias("min_y"),
        F.max("y").cast("long").alias("max_y"),
        (F.floor(spanx * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias(
            "span_x"
        ),
        (F.floor(spany * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias(
            "span_y"
        ),
    )


def zorder_sql(
    colx: str, coly: str, bits: int = 8, file_bits: int = 6
) -> str:
    """The DuckDB twin of zorder_audit's arithmetic, as the SELECT-
    list fragment computing ``file_id`` from pre-joined min/max
    scalar columns mnx/mxx/mny/mxy. Kept beside the implementation
    so the bit layout can never drift from the oracle."""
    mx = 1 << bits
    bx = (
        f"CAST(floor((({colx} - mnx) * {mx - 1}) / "
        f"greatest(mxx - mnx, 1)) AS BIGINT)"
    )
    by = (
        f"CAST(floor((({coly} - mny) * {mx - 1}) / "
        f"greatest(mxy - mny, 1)) AS BIGINT)"
    )
    terms = []
    for i in range(bits):
        terms.append(f"((({bx}) >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"((({by}) >> {i}) & 1) * {1 << (2 * i)}")
    z = " + ".join(terms)
    return f"(({z}) >> {2 * bits - file_bits})"
