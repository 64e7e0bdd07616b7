"""Distributed EXACT global ranking — the two-phase TeraSort shape.

A global ``row_number()``/``ntile()``/running-total window with no
PARTITION BY plans as ``Exchange SinglePartition``: every row of the
frame serializes through one task, which is the classic 100 TB
scale-killer (VERDICT r7 flagged four queries doing exactly this over
frames that grow linearly with the corpus).

The fix is the sampling range-partitioner every external sort uses
(TeraSort; Spark's own ``RangePartitioner`` behind
``repartitionByRange``), done at the DataFrame level so the result is
EXACT — bit-identical to the single-partition window — while the
data-sized work stays parallel:

1. **Breakpoints**: one scalar aggregation computes ~``n_buckets``
   approximate quantiles of the sort value (``percentile_approx``) and
   collects them to the driver — a model-sized collect (≤63 doubles),
   the same move Spark's RangePartitioner makes when it freezes its
   range bounds driver-side so a stage retry can never resample
   different bounds mid-job. Breakpoint ACCURACY only affects bucket
   balance, never correctness.
2. **Bucket assignment**: each row maps to the count of breakpoints
   strictly below its value — an order-contiguous bucket id evaluated
   row-local against the literal breakpoint array (no shuffle, no
   second reference to the input plan).
3. **Local rank**: ``row_number()``/``sum()`` windows PARTITIONED BY
   bucket — the one data-sized exchange, ``hashpartitioning(_bkt)``,
   parallel across the cluster. Rows with equal sort values share a
   bucket by construction, so tie-break columns resolve inside one
   partition and the local order equals the global order restricted to
   the bucket.
4. **Offsets**: per-bucket counts (or sums) aggregate to a
   ≤``n_buckets``-row frame, collected driver-side (model-sized) and
   folded into a literal CASE lookup: ``global = offset(bucket) +
   local`` — exact, and the returned plan contains the input subtree
   exactly ONCE (an earlier draft kept offsets as a broadcast-join
   DataFrame; chaining three of those multiplied the input subtree
   ~4× per level into a 391-exchange plan).

``ntile(k)`` then needs no window at all: the SQL-standard tile of a
row is a closed-form function of its global rank and the total row
count n (the first ``n mod k`` tiles get ``floor(n/k)+1`` rows, the
rest ``floor(n/k)``), evaluated per-row from driver-known constants.

Cost model: each call runs two extra scalar jobs over the input
(breakpoint quantiles, bucket histogram) before the main pass — at
100 TB, pass ``persist_input=True`` when chaining several rankings
(q177 chains three) or when the input embeds expensive upstream
work (q181 joins classifier scores): the first scalar job then
materializes the cache and every later pass reads
``InMemoryTableScan`` instead of re-running the input lineage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _breakpoints(
    df: DataFrame, value_col: str, n_buckets: int
) -> list[float]:
    """Approximate-quantile breakpoints, deduped (skewed values can
    repeat a quantile; merging the duplicates just merges buckets —
    order contiguity is preserved)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.percentile_approx(
            # accuracy only shapes bucket BALANCE, never correctness
            # (exactness comes from the offset fold); 2000 halves the
            # sketch pass vs 10000 with indistinguishable balance
            F.col(value_col).cast("double"), probs, 2000
        ).alias("_bps")
    ).collect()[0]
    return sorted(set(row["_bps"] or []))


def _bucket_expr(value_col: str, bps: list[float]) -> Column:
    """Order-contiguous bucket id: count of breakpoints strictly below
    the value, as a short-circuiting WHEN chain over the sorted
    literals (bucket i ⟺ value <= bps[i] and value > bps[i-1] — for
    sorted unique bps this IS the strictly-below count). Row-local,
    whole-stage-codegen compiled; an earlier F.aggregate form over a
    literal array evaluated the higher-order lambda interpreted per
    row-element and cost ~3s/600k rows where this chain costs ~0.3s."""
    if not bps:
        return F.lit(0)
    v = F.col(value_col).cast("double")
    expr = F.when(v <= F.lit(float(bps[0])), F.lit(0))
    for i, b in enumerate(bps[1:], start=1):
        expr = expr.when(v <= F.lit(float(b)), F.lit(i))
    return expr.otherwise(F.lit(len(bps)))


def _offset_expr(offsets: dict[int, int], bkt_col: str = "_bkt") -> Column:
    """Literal bucket→offset lookup (≤n_buckets branches)."""
    expr = F.lit(None).cast("long")
    for bkt, off in offsets.items():
        expr = F.when(F.col(bkt_col) == bkt, F.lit(off)).otherwise(expr)
    return expr


def _order(
    value_col: str, ascending: bool, tie_cols: Sequence[str]
) -> list[Column]:
    head = F.asc(value_col) if ascending else F.desc(value_col)
    return [head] + [F.asc(c) for c in tie_cols]


def _bucketed_offsets(
    df: DataFrame,
    value_col: str,
    ascending: bool,
    n_buckets: int,
    weight_col: str | None = None,
    persist_input: bool = False,
) -> tuple[DataFrame, dict[int, int], int]:
    """Shared phases 1-2-4: bucketed frame, the cumulative offset of
    each bucket in rank order, and the grand total (row count, or
    ``weight_col`` sum when given).

    ``persist_input`` caches the input frame before the device's two
    scalar passes (breakpoint quantiles, bucket histogram) touch it:
    the breakpoint collect materializes the cache, the histogram and
    the downstream window pass read ``InMemoryTableScan`` — the input
    lineage is computed exactly ONCE per call instead of three times.
    Chained callers (q177 chains three rankings; q181 feeds a
    classifier-scored join) MUST set it, or each call's collects
    re-run the whole upstream chain (the r8 hazard this knob
    closes). The cache is left registered — Spark dedupes by
    canonicalized plan and evicts LRU; callers that need eager
    release can ``.unpersist()`` after materializing their result."""
    if persist_input:
        df = df.persist()
    bps = _breakpoints(df, value_col, n_buckets)
    b = df.withColumn("_bkt", _bucket_expr(value_col, bps))
    agg = (
        F.count("*")
        if weight_col is None
        else F.sum(weight_col)
    )
    counts = {
        r["_bkt"]: r["_c"]
        for r in b.groupBy("_bkt").agg(agg.cast("long").alias("_c")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for bkt in sorted(counts, reverse=not ascending):
        offsets[bkt] = acc
        acc += counts[bkt]
    return b, offsets, acc


def global_row_number(
    df: DataFrame,
    value_col: str,
    *,
    ascending: bool = True,
    tie_cols: Sequence[str] = (),
    n_buckets: int = 64,
    out_col: str = "grank",
    persist_input: bool = False,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY value [, ties])``
    without a SinglePartition exchange over the data. ``tie_cols``
    must make the total order unique for the result to be
    deterministic (same contract as the window it replaces).
    ``persist_input`` caches the input so the device's two scalar
    collects don't re-run its lineage — required when chaining."""
    b, offsets, _ = _bucketed_offsets(
        df, value_col, ascending, n_buckets, persist_input=persist_input
    )
    lw = Window.partitionBy("_bkt").orderBy(
        *_order(value_col, ascending, tie_cols)
    )
    return (
        b.withColumn("_lr", F.row_number().over(lw).cast("long"))
        .withColumn(out_col, _offset_expr(offsets) + F.col("_lr"))
        .drop("_bkt", "_lr")
    )


def global_ntile(
    df: DataFrame,
    value_col: str,
    k: int,
    *,
    ascending: bool = True,
    tie_cols: Sequence[str] = (),
    n_buckets: int = 64,
    out_col: str = "tile",
    persist_input: bool = False,
) -> DataFrame:
    """Exact global ``ntile(k) OVER (ORDER BY value [, ties])`` via
    the two-phase rank: SQL-standard ntile assigns the first
    ``n mod k`` tiles ``floor(n/k)+1`` rows and the rest
    ``floor(n/k)``, so the tile is a closed-form expression of the
    global rank and the driver-known total — no window over the
    data, no SinglePartition exchange. ``persist_input`` caches the
    input so the device's two scalar collects don't re-run its
    lineage — required when chaining (q177) or when the input embeds
    expensive upstream work (q181's classifier scoring)."""
    b, offsets, n = _bucketed_offsets(
        df, value_col, ascending, n_buckets, persist_input=persist_input
    )
    lw = Window.partitionBy("_bkt").orderBy(
        *_order(value_col, ascending, tie_cols)
    )
    gr = _offset_expr(offsets) + F.col("_lr")
    return (
        b.withColumn("_lr", F.row_number().over(lw).cast("long"))
        .withColumn(out_col, _tile_expr(gr, n, k).cast("int"))
        .drop("_bkt", "_lr")
    )


def _tile_expr(gr: Column, n: int, k: int) -> Column:
    """SQL-standard ntile as a closed form of the global rank ``gr``
    and the driver-known total ``n``: the first ``n mod k`` tiles get
    ``floor(n/k)+1`` rows, the rest ``floor(n/k)``."""
    small, r = divmod(n, k)  # r big tiles of small+1 rows, then small
    cut = r * (small + 1)  # ranks 1..cut live in the big tiles
    if small == 0:  # n < k: every tile is one row, tile == rank
        return gr
    return F.when(
        gr <= cut,
        F.floor((gr - F.lit(1)) / F.lit(small + 1)) + F.lit(1),
    ).otherwise(
        F.lit(r)
        + F.floor((gr - F.lit(cut) - F.lit(1)) / F.lit(small))
        + F.lit(1)
    )


def global_ntile_multi(
    df: DataFrame,
    specs: Sequence[dict],
    *,
    n_buckets: int = 64,
    persist_input: bool = False,
) -> DataFrame:
    """Several exact global ``ntile(k)`` columns over the SAME frame in
    one device call — the chaining case (q177 scores recency/
    frequency/monetary quintiles on one customer frame) collapsed from
    S sequential ``global_ntile`` calls to:

    - ONE persist of the input (the chained form persisted every
      intermediate, writing the frame to cache S times),
    - ONE breakpoint aggregation computing every spec's
      ``percentile_approx`` sketch in the same scalar job,
    - the bucketed frame (input + S ``_bkt_i`` columns) persisted, so
      every 64-branch bucket WHEN-chain is evaluated once per row and
      MATERIALIZED — Catalyst's projection collapse otherwise
      re-inlines the chain into every downstream reference (a
      count-if histogram draft paid n_buckets × chain-depth branch
      evaluations per row: 3.8s where this shape costs 0.3s),
    - ONE histogram job: posexplode the S bucket ids to (spec,
      bucket) rows and count — ≤ S×n_buckets output rows, one pass,
      and it doubles as the cache materialization,
    - then all S bucket-local windows pipeline inside the one
      downstream job reading stored ``_bkt_i`` ints. Each window
      still needs its own ``hashpartitioning(_bkt_i)`` exchange
      (different partition keys), but no exchange output is ever
      re-materialized or re-cached between scores.

    Each spec is a dict with keys ``value_col``, ``k``, ``out_col``
    and optional ``ascending`` (default True), ``tie_cols``
    (default ()). Bit-identical to applying ``global_ntile`` per spec.
    """
    if persist_input:
        df = df.persist()
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bp_row = df.agg(
        *[
            F.percentile_approx(
                F.col(s["value_col"]).cast("double"), probs, 2000
            ).alias(f"_bps{i}")
            for i, s in enumerate(specs)
        ]
    ).collect()[0]
    all_bps = [
        sorted(set(bp_row[f"_bps{i}"] or [])) for i in range(len(specs))
    ]
    b = df
    for i, (s, bps) in enumerate(zip(specs, all_bps)):
        b = b.withColumn(f"_bkt{i}", _bucket_expr(s["value_col"], bps))
    b = b.persist()
    hist = {
        (r["_sp"], r["_bk"]): r["_c"]
        for r in b.select(
            F.posexplode(
                F.array(*[F.col(f"_bkt{i}") for i in range(len(specs))])
            ).alias("_sp", "_bk")
        )
        .groupBy("_sp", "_bk")
        .agg(F.count("*").cast("long").alias("_c"))
        .collect()
    }
    if persist_input:
        # the bucketed cache supersedes the input cache (same rows +
        # the S int columns); release the narrower one eagerly
        df.unpersist()
    out = b
    tmp_cols: list[str] = []
    for i, (s, bps) in enumerate(zip(specs, all_bps)):
        ascending = s.get("ascending", True)
        counts = {
            bk: c for (sp, bk), c in hist.items() if sp == i
        }
        offsets: dict[int, int] = {}
        acc = 0
        for bkt in sorted(counts, reverse=not ascending):
            offsets[bkt] = acc
            acc += counts[bkt]
        lw = Window.partitionBy(f"_bkt{i}").orderBy(
            *_order(s["value_col"], ascending, s.get("tie_cols", ()))
        )
        gr = _offset_expr(offsets, f"_bkt{i}") + F.col(f"_lr{i}")
        out = out.withColumn(
            f"_lr{i}", F.row_number().over(lw).cast("long")
        ).withColumn(s["out_col"], _tile_expr(gr, acc, s["k"]).cast("int"))
        tmp_cols += [f"_bkt{i}", f"_lr{i}"]
    return out.drop(*tmp_cols)


def global_running_sum(
    df: DataFrame,
    value_col: str,
    sum_col: str,
    *,
    ascending: bool = True,
    tie_cols: Sequence[str] = (),
    n_buckets: int = 64,
    out_col: str = "cum",
    persist_input: bool = False,
) -> DataFrame:
    """Exact global running total ``sum(sum_col) OVER (ORDER BY value
    [, ties] ROWS UNBOUNDED PRECEDING)`` via the same two phases:
    bucket-local running sums plus literal per-bucket sum offsets.
    ``sum_col`` must be integral (long) so partial sums re-associate
    exactly across the split. ``persist_input`` caches the input so
    the device's two scalar collects don't re-run its lineage."""
    b, offsets, _ = _bucketed_offsets(
        df, value_col, ascending, n_buckets,
        weight_col=sum_col, persist_input=persist_input,
    )
    lw = (
        Window.partitionBy("_bkt")
        .orderBy(*_order(value_col, ascending, tie_cols))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        b.withColumn("_lc", F.sum(sum_col).over(lw).cast("long"))
        .withColumn(out_col, _offset_expr(offsets) + F.col("_lc"))
        .drop("_bkt", "_lc")
    )
