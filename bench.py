#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is forced with a full count() after a shared warmup query
that spins up the JVM/executor pool. Every query runs three times
(the heavy dedup/ANN family five — r4 showed +-25% min-of-3 swings on
those 2-3s queries with ZERO code change, too noisy to detect a real
1.3x regression) and the MINIMUM is reported — the engine is a
long-running server (the reference holds one engine-lifetime
SessionContext, lynx.rs:38), so steady-state (post-JIT) latency is
the representative number. The JSON line additionally carries
"queries_median" (per-query median of the post-warmup reps) and
"noise_band" (mean of (median-min)/min across queries).

Round-over-round comparison (the compact final line) is MEDIAN-based
as of r12: `geomean_vs_prev_median` is the primary figure and
`top_deltas_median` the drill-down, with the min-based
`geomean_vs_prev_min` kept alongside for continuity with r01-r11
artifacts. Rationale: three consecutive rounds spent min-of-N replays
refuting phantom regressions (q160-r9, q110-r10, q218/q214-r11) —
a single unlucky rep moves a min far more than a median.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    # relational surface
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q07_window_rank",
    "q09_distinct_agg",
    "q12_events_daily",
    "q19_asof_join",
    "q41_gap_fill_locf",
    "q42_downsample",
    # training-data extensions
    "q21_dedup_exact",
    "q22_ngram_jaccard",
    "q23_minhash_lsh",
    "q24_cosine_topk",
    "q25_ann_lsh",
    "q26_text_stats",
    "q30_simhash",
    "q65_frequent_ngrams",
    "q66_duplicated_windows",
    "q72_chunk_documents",
    "q76_tfidf_terms",
    "q77_sketch_audit",
    # session B flagships: corpus-wide kNN graph (the heaviest new
    # shape) + BM25 retrieval (filtered-stream aggregation)
    "q83_knn_graph",
    "q89_bm25_search",
    # session C: incremental winnow (the heaviest textual compute —
    # ~one md5 per char position) + paragraph-granular dedup
    "q110_incremental_winnow",
    "q111_paragraph_dedup",
    # round 6: the graph/sketch/quantization families gain BENCH
    # tracking (they had scale_check rows but no round-over-round
    # perf signal) — PageRank + HITS (iterative, lineage-truncated),
    # triangles (3 shuffle joins), IVF-PQ (train-dominated; the
    # persisted-index tier makes that build-cadence), HLL audit
    "q127_pagerank",
    "q131_ivfpq_search",
    "q133_hll_audit",
    "q136_triangle_stats",
    "q140_hits",
    # round 7: the store-backed twins (VERDICT r06 task 4) — same
    # algorithms reading the PERSISTED kNN edge store / IVF-PQ index
    # instead of rebuilding inline. The first rep builds the store
    # (build cadence); min-of-5 is then true query-cadence latency,
    # so BENCH reports both tiers side by side.
    "q141_pagerank_stored",
    "q142_hits_stored",
    "q143_triangles_stored",
    "q144_label_prop_stored",
    "q145_wpagerank_stored",
    "q146_ivfpq_stored",
    # round 8: representatives of the r7 additions (VERDICT r7 task 5
    # — none of q147-q181 had a bench row, so a regression in the
    # round's own families was invisible): BPE trainer (20
    # vocabulary-granular merge aggregations), sweep-line concurrency
    # (day-partitioned running sum), prefix-filter set-similarity
    # join (the PPJoin-style candidate generator), basket rules
    # (within-order pair join), plus the three two-phase-rank
    # rewrites whose plans changed this round
    "q147_bpe_train",
    "q160_peak_concurrency",
    "q170_prefix_filter_join",
    "q176_basket_rules",
    "q177_rfm_segments",
    "q179_pareto_abc",
    "q181_decile_gains",
    # round-8 additions: fact-grain order statistics via the ranking
    # device, the Misra-Gries two-pass (mapInPandas cost visible),
    # the one-scan perplexity aggregation, and the composed funnel
    # (persist + three operator families in one query)
    "q183_equidepth_histogram",
    "q191_heavy_hitters",
    "q196_heldout_perplexity",
    "q197_curation_funnel",
    # round-9 representatives: device-with-persist at fact grain
    # (Gini), the persisted-bigram marginal family (G-test), the
    # value-grain midrank correlation, and the per-user interval
    # merge (window family)
    "q205_gini_concentration",
    "q207_gtest_collocations",
    "q209_spearman_rank_corr",
    "q214_interval_islands",
    # round-9 second/third batch representatives: the custkey-window
    # survival curve (fact-window family) and the vocabulary-grain
    # self-join (the heaviest new shape)
    "q218_kaplan_meier",
    "q227_source_profile_cosine",
    # round-10 representatives: the new quantile-sketch audit and
    # the two heaviest cohort entries (bootstrap resampling grid,
    # source-vocabulary Jaccard join); the reshaped q177/q160 stay
    # tracked through their existing rows
    "q216_quantile_sketch_audit",
    "q239_bootstrap_ci",
    "q242_source_vocab_jaccard",
    # round-11 representatives: the iterative matvec family (PCA — the
    # heaviest new shape: n_iters+1 passes over the persisted integer
    # grid), the probe-broadcast leakage audit, and the fact-fact
    # order-grain blame aggregation
    "q250_embedding_leakage",
    "q251_pca_power_iteration",
    "q254_waiting_orders",
    # round-11 second batch representatives: BFS traversal (frontier
    # joins on the kNN graph — the newest iterative shape), TextRank
    # (tokenize+bigram scan feeding vocab-grain PageRank), conformal
    # coverage (three md5-split passes over the event fact), two-NN
    # intrinsic dimension (the 64-probe linear scan + min-structs)
    "q255_bfs_reachability",
    "q258_textrank_keywords",
    "q259_conformal_coverage",
    "q260_intrinsic_dimension",
    # round-11 batches 3-4 representatives: value-domain^2 Walsh
    # pairs (the heaviest new device) and the Newton-on-cached-grain
    # calibration fit (3 driver-folded passes)
    "q264_hodges_lehmann",
    "q269_platt_scaling",
]


def _md5_worker(n_mb: int) -> float:
    """Hash n_mb MB of zeros; runs in a pool worker for the
    multi-core calibration (must be module-level for pickling)."""
    import hashlib
    import time as _t

    buf = b"x" * (1 << 20)
    t0 = _t.perf_counter()
    h = hashlib.md5()
    for _ in range(n_mb):
        h.update(buf)
    return _t.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lynx_spark.session import get_spark
    from lynx_spark.plans.analytics import REGISTRY

    spark = get_spark("lynx_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch the biggest table so JVM/codegen/reader are hot
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    import gc
    import statistics

    # the heavy dedup/ANN queries need 5 reps for a stable min: their
    # 2-3s runtimes swing +-25% at 3 reps on this harness
    # q03 is here for dispersion, not weight: its plan is static (two
    # broadcast joins, no AQE flap) but reps decline ~0.97 -> 0.50s
    # as JIT warms, so a 3-rep min lands mid-slope
    HEAVY_REPS = {"q22_ngram_jaccard", "q23_minhash_lsh", "q24_cosine_topk",
                  "q25_ann_lsh", "q30_simhash", "q66_duplicated_windows",
                  "q77_sketch_audit", "q83_knn_graph",
                  "q110_incremental_winnow", "q03_shipping_priority",
                  "q127_pagerank", "q131_ivfpq_search", "q133_hll_audit",
                  "q136_triangle_stats", "q140_hits",
                  "q141_pagerank_stored", "q142_hits_stored",
                  "q143_triangles_stored", "q144_label_prop_stored",
                  "q145_wpagerank_stored", "q146_ivfpq_stored",
                  "q147_bpe_train", "q170_prefix_filter_join",
                  "q181_decile_gains"}

    # SPARK_GRAFT_BENCH_REPS overrides the per-query rep counts — for
    # the sf1 (10x) headline run, min-of-2 keeps the wall-clock sane
    # while still shedding the first rep's JIT (the sf1 artifact
    # measures scaling shape, not round-over-round deltas)
    rep_override = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "0"))

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY[name]
        runs = []
        for _ in range(rep_override or (5 if name in HEAVY_REPS else 3)):
            start = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - start)
            # operators persist multi-use intermediates; drop them
            # between runs so successive queries measure themselves,
            # not the previous query's cache pressure
            spark.catalog.clearCache()
            gc.collect()
        timings[name] = round(min(runs), 4)
        # exclude the first (JIT-paying) rep from the median so it
        # reflects steady-state dispersion, not compilation
        medians[name] = round(statistics.median(runs[1:] or runs), 4)
        print(
            f"# {name}: {timings[name]:.3f}s min of {[round(r, 3) for r in runs]} "
            f"median {medians[name]:.3f}s ({n} rows)",
            file=sys.stderr,
        )

    # write path: the reference's core TSDB role — WAL append + buffer
    # insert per record (its bound: write_all+flush per record behind a
    # mutex, wal.rs:245-250). Measured as rows/sec over 20k writes,
    # reported as the seconds the batch took, like the queries.
    #
    # r8: measured in a CLEAN SUBPROCESS, min of 3 reps. Inline at the
    # tail of this session, the number tracked the SESSION, not the
    # write path: the same loop ran 100k rows/s in a fresh process,
    # ~70k/s with an idle in-process JVM, and ~48k/s right after a few
    # bench queries — and HEADLINE grew 26→31→37 queries over r5→r7,
    # which is exactly the monotone 104k→70k→34k/s "decline" VERDICT
    # r7 flagged on untouched server/wal code. The subprocess isolates
    # the metric from heap/JVM state so rounds compare like for like.
    import subprocess

    w0_src = (
        "import json, sys, time, tempfile\n"
        f"sys.path.insert(0, {str(Path(__file__).resolve().parent)!r})\n"
        "from lynx_spark.engine import LynxEngine\n"
        "from lynx_spark.model import WriteRequest\n"
        "reps = []\n"
        "for _ in range(3):\n"
        "    with tempfile.TemporaryDirectory() as wal_dir:\n"
        "        engine = LynxEngine(None, wal_dir)\n"
        "        start = time.perf_counter()\n"
        "        for i in range(20000):\n"
        "            engine.write(WriteRequest(\n"
        "                'bench', 'cpu', str(i), {'host': f'h{i % 50}'}, i))\n"
        "        reps.append(time.perf_counter() - start)\n"
        "        engine.wal.close()\n"
        "print(json.dumps(reps))\n"
    )
    n_writes = 20_000
    # subprocess emits ALL reps (ADVICE r12: value_median must be
    # purely median-based, so every timings entry needs a real median
    # beside its min — same rep-1-excluded convention as the queries)
    w0_runs = json.loads(
        subprocess.run(
            [sys.executable, "-c", w0_src],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
    )
    elapsed = min(w0_runs)
    timings["w0_ingest_20k_writes"] = round(elapsed, 4)
    medians["w0_ingest_20k_writes"] = round(
        statistics.median(w0_runs[1:] or w0_runs), 4
    )
    print(
        f"# w0_ingest_20k_writes: {elapsed:.3f}s "
        f"({n_writes / elapsed:,.0f} rows/s, clean subprocess, min of 3)",
        file=sys.stderr,
    )

    # w1 (r14, VERDICT r13 task 4): the HTTP-path twin of w0 — the
    # same 20k writes through the full /api/v1/write dispatch (WSGI
    # request -> JSON parse -> WriteRequest -> WAL append + flush).
    # m1 exposed this as the system's visible ingest ceiling (~3.3k
    # writes/s, all dispatch); the write fast lane (server.py) now
    # handles the hot route at the WSGI layer with identical
    # parse/validate/500 semantics. Clean subprocess like w0. Every
    # response is status-checked: a 500 must fail the row, not time it.
    w1_src = (
        "import json, sys, time, tempfile\n"
        f"sys.path.insert(0, {str(Path(__file__).resolve().parent)!r})\n"
        "from lynx_spark.engine import LynxEngine\n"
        "from lynx_spark.server import create_app\n"
        "reps = []\n"
        "for _ in range(3):\n"
        "    with tempfile.TemporaryDirectory() as wal_dir:\n"
        "        engine = LynxEngine(None, wal_dir)\n"
        "        client = create_app(engine).test_client()\n"
        "        bodies = [json.dumps({\n"
        "            'namespace': 'bench', 'measurement': 'cpu',\n"
        "            'value': str(i), 'metadata': {'host': f'h{i % 50}'},\n"
        "            'timestamp': i}) for i in range(20000)]\n"
        "        start = time.perf_counter()\n"
        "        for body in bodies:\n"
        "            r = client.post('/api/v1/write', data=body,\n"
        "                            content_type='application/json')\n"
        "            if r.status_code != 200:\n"
        "                raise AssertionError(f'w1 write {r.status_code}')\n"
        "        reps.append(time.perf_counter() - start)\n"
        "        engine.wal.close()\n"
        "print(json.dumps(reps))\n"
    )
    w1_runs = json.loads(
        subprocess.run(
            [sys.executable, "-c", w1_src],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
    )
    w1 = min(w1_runs)
    timings["w1_http_ingest_20k_writes"] = round(w1, 4)
    medians["w1_http_ingest_20k_writes"] = round(
        statistics.median(w1_runs[1:] or w1_runs), 4
    )
    print(
        f"# w1_http_ingest_20k_writes: {w1:.3f}s "
        f"({n_writes / w1:,.0f} writes/s through /api/v1/write, "
        f"clean subprocess, min of 3)",
        file=sys.stderr,
    )

    # streaming grid-percentile tier (r10): the events value column
    # split into four files and drained through percentile_stream's
    # availableNow path with maxFilesPerTrigger=1 — four micro-batches,
    # each paying the full incremental contract (histogram merge with
    # the prior state, nearest-rank pass, store write, marker commit).
    # The input split and session startup are untimed setup; the timed
    # span is stream start to drain.
    #
    # r11: measured in a CLEAN SUBPROCESS like w0 — in-bench the row
    # inherited the session's JVM/heap/state-store pressure from the
    # 58 queries before it (7.1-7.7s in-bench vs ~4.9s fresh, r10
    # verdict task 7), so rounds compared session contamination, not
    # the streaming path. Two reps against fresh store/checkpoint
    # dirs; the first warms the streaming engine (~10s of cold JIT
    # that the r10 manual probes also excluded — the decline curve is
    # 13.1 -> 7.1 -> 6.4 -> 6.0 -> 6.1 at the r11 head) and the
    # MINIMUM OF THE REMAINING THREE is reported — the steady-state
    # drain, same convention as the query tier's post-warmup minimum.
    s1_src = (
        "import sys, time, tempfile, shutil\n"
        f"sys.path.insert(0, {str(Path(__file__).resolve().parent)!r})\n"
        "from lynx_spark.session import get_spark\n"
        "from pyspark.sql import functions as F\n"
        "from lynx_spark.streaming.incremental import percentile_stream\n"
        "spark = get_spark('bench_s1')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"sf_dir = {sf_dir!r}\n"
        "sdir = tempfile.mkdtemp(prefix='bench_stream_')\n"
        "try:\n"
        "    (spark.read.parquet(f'{sf_dir}/events.parquet')\n"
        "     .select(F.col('value').cast('double').alias('value'))\n"
        "     .repartition(4).write.mode('overwrite')\n"
        "     .parquet(f'{sdir}/in'))\n"
        "    reps = []\n"
        "    for rep in range(4):\n"
        "        ev = (spark.readStream.schema('value double')\n"
        "              .option('maxFilesPerTrigger', 1)\n"
        "              .parquet(f'{sdir}/in'))\n"
        "        t0 = time.perf_counter()\n"
        "        q = percentile_stream(ev, 'value',\n"
        "                              f'{sdir}/store{rep}',\n"
        "                              f'{sdir}/ck{rep}')\n"
        "        q.awaitTermination()\n"
        "        reps.append(time.perf_counter() - t0)\n"
        "    import json as _j\n"
        "    print(_j.dumps(reps))\n"
        "finally:\n"
        "    shutil.rmtree(sdir, ignore_errors=True)\n"
    )
    s1_runs = json.loads(
        subprocess.run(
            [sys.executable, "-c", s1_src],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip().splitlines()[-1]
    )
    # rep 1 warms the streaming engine (~10s cold JIT) and is excluded
    # from BOTH figures, same as before the all-reps change
    s1 = min(s1_runs[1:])
    timings["s1_percentile_stream_4b"] = round(s1, 4)
    medians["s1_percentile_stream_4b"] = round(
        statistics.median(s1_runs[1:]), 4
    )
    print(
        f"# s1_percentile_stream_4b: {s1:.3f}s "
        f"(4 micro-batches, availableNow, clean subprocess)",
        file=sys.stderr,
    )

    # multi-table HTTP surface (r12, VERDICT r11 task 6): a real JOIN
    # over ingested measurements through the /api/v1/query route under
    # multi_table=True — the flagged superset the engine tests cover
    # but no driver-visible artifact exercised. 1000 rows per
    # measurement through the write route (WAL + buffer), then the
    # hot-tier join via the full WSGI path; the 404 probes assert the
    # reference's unknown-namespace/table semantics survive the flag.
    # Timed span: min-of-3 of the JOIN query round trip.
    import tempfile as _tf

    from lynx_spark.server import create_app as _mk_app
    from lynx_spark.sources.coldtier import TieredEngine as _TE

    def _check(cond: bool, msg: str) -> None:
        # explicit raise, not `assert`: these oracle checks are what
        # makes the bench rows self-verifying, and a bare assert is
        # silently stripped under `python -O` (r13 ADVICE item).
        if not cond:
            raise AssertionError(msg)

    with _tf.TemporaryDirectory() as _mt_dir:
        _eng = _TE(
            spark,
            Path(_mt_dir) / "wal",
            Path(_mt_dir) / "cold",
            multi_table=True,
        )
        _c = _mk_app(_eng).test_client()
        for i in range(1000):
            for meas, val in (("cpu", str(i)), ("mem", str(i * 2))):
                _check(
                    _c.post(
                        "/api/v1/write",
                        json={
                            "namespace": "bench",
                            "measurement": meas,
                            "value": val,
                            "metadata": {"host": f"h{i % 50}"},
                            "timestamp": i,
                        },
                    ).status_code
                    == 200,
                    "m0 write did not return 200",
                )
        _join = (
            '{"namespace": "bench", "format": "Json", "query": '
            '"SELECT c.host AS host, count(*) AS n FROM cpu c '
            "JOIN mem m ON c.timestamp = m.timestamp "
            'GROUP BY c.host ORDER BY host"}'
        )
        m0_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = _c.post(
                "/api/v1/query",
                data=_join,
                content_type="application/json",
            )
            m0_runs.append(time.perf_counter() - t0)
            _check(
                r.status_code == 200
                and len(json.loads(r.get_data())) == 50,
                "m0 join oracle mismatch",
            )
        _check(
            _c.post(
                "/api/v1/query",
                json={"namespace": "nope", "query": "SELECT * FROM cpu"},
            ).status_code
            == 404,
            "m0 unknown-namespace probe did not 404",
        )
        _check(
            _c.post(
                "/api/v1/query",
                json={"namespace": "bench", "query": "SELECT * FROM gpu"},
            ).status_code
            == 404,
            "m0 unknown-table probe did not 404",
        )
        _eng.wal.close()
    timings["m0_multi_table_http_join"] = round(min(m0_runs), 4)
    medians["m0_multi_table_http_join"] = round(
        statistics.median(m0_runs[1:] or m0_runs), 4
    )
    print(
        f"# m0_multi_table_http_join: {min(m0_runs):.3f}s "
        f"(2k-row ingest, hot-tier JOIN via /api/v1/query, 404s hold)",
        file=sys.stderr,
    )

    # multi-table at volume (r13, VERDICT r12 task 6): m0 joins 3 rows
    # per host — this row proves the path beyond a toy. 100k rows
    # across two measurements through the real /api/v1/write route
    # (untimed setup, ~30s of WSGI dispatch), then a grouped JOIN via
    # /api/v1/query whose result is asserted against the closed-form
    # expectation the deterministic ingest implies (the oracle): mem
    # timestamps are the even numbers, so the join keeps even cpu
    # rows only — 50 even-host groups of 500. A trivial count(*)
    # probe is timed beside it: per-query re-registration
    # (measurements_to_arrow + createDataFrame of each 50k-row hot
    # table) must stay sub-dominant to the join itself.
    with _tf.TemporaryDirectory() as _mt_dir:
        _eng = _TE(
            spark,
            Path(_mt_dir) / "wal",
            Path(_mt_dir) / "cold",
            multi_table=True,
        )
        _c = _mk_app(_eng).test_client()
        t0 = time.perf_counter()
        for i in range(50_000):
            _c.post(
                "/api/v1/write",
                json={
                    "namespace": "bench",
                    "measurement": "cpu",
                    "value": str(i),
                    "metadata": {"host": f"h{i % 100}"},
                    "timestamp": i,
                },
            )
            _c.post(
                "/api/v1/write",
                json={
                    "namespace": "bench",
                    "measurement": "mem",
                    "value": str(2 * i),
                    "metadata": {},
                    "timestamp": 2 * i,
                },
            )
        m1_ingest = time.perf_counter() - t0
        _join = (
            '{"namespace": "bench", "format": "Json", "query": '
            '"SELECT c.host AS host, count(*) AS n FROM cpu c '
            "JOIN mem m ON c.timestamp = m.timestamp "
            'GROUP BY c.host ORDER BY host"}'
        )
        expected = {f"h{h}": 500 for h in range(0, 100, 2)}
        m1_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = _c.post(
                "/api/v1/query",
                data=_join,
                content_type="application/json",
            )
            m1_runs.append(time.perf_counter() - t0)
            _check(r.status_code == 200, "m1 join query did not 200")
            got = {
                row["host"]: row["n"] for row in json.loads(r.get_data())
            }
            _check(got == expected, "m1 oracle mismatch")
        probe_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = _c.post(
                "/api/v1/query",
                json={
                    "namespace": "bench",
                    "format": "Json",
                    "query": "SELECT count(*) AS n FROM cpu",
                },
            )
            probe_runs.append(time.perf_counter() - t0)
            _check(
                json.loads(r.get_data()) == [{"n": 50_000}],
                "m1 count probe mismatch",
            )
        _eng.wal.close()
    timings["m1_multi_table_http_join_100k"] = round(min(m1_runs), 4)
    medians["m1_multi_table_http_join_100k"] = round(
        statistics.median(m1_runs[1:] or m1_runs), 4
    )
    print(
        f"# m1_multi_table_http_join_100k: {min(m1_runs):.3f}s "
        f"(100k-row ingest in {m1_ingest:.1f}s untimed, oracle holds; "
        f"single-table re-registration probe {min(probe_runs):.3f}s)",
        file=sys.stderr,
    )

    # cold tier at volume (r14, VERDICT r13 task 1): every prior
    # volume artifact exercised the hot buffer (m1) or raw parquet
    # (registry) — this row queries the layer the 100 TB posture
    # actually lives on. 1M rows spanning 34 days ingested through
    # the engine write path (WAL + buffer, untimed setup), flushed to
    # date-partitioned parquet, then through the real /api/v1/query
    # route: (a) a day-bounded aggregate that must prune to ~1/34 of
    # the files and (b) an unbounded DISTINCT aggregate over all 1M
    # rows. Oracles are closed-form from the deterministic ingest;
    # the pruning pin asserts files-read << files-total via the
    # executed scan's numFiles metric (inputFiles() lists the
    # relation's full fileset PRE-pruning, so it cannot witness
    # pruning) plus the PartitionFilters marker in the plan. The pin
    # runs with AQE off because materialized query stages hide the
    # scan's metrics from collectLeaves; partition pruning itself is
    # static planning, identical either way.
    C1_N = 1_000_000
    C1_SPACING_US = 2_900_000  # ~33.6 days for 1M rows
    C1_DAY_US = 86_400_000_000
    c1_day = 15  # 1970-01-16
    c1_lo_i = -((-c1_day * C1_DAY_US) // C1_SPACING_US)  # ceil div
    c1_hi_i = -((-(c1_day + 1) * C1_DAY_US) // C1_SPACING_US)
    c1_expected_day_n = max(0, min(c1_hi_i, C1_N) - min(c1_lo_i, C1_N))
    with _tf.TemporaryDirectory() as _c1_dir:
        _eng = _TE(spark, Path(_c1_dir) / "wal", Path(_c1_dir) / "cold")
        from lynx_spark.model import WriteRequest as _WR

        t0 = time.perf_counter()
        for i in range(C1_N):
            _eng.write(
                _WR(
                    "bench",
                    "cpu",
                    str(i),
                    {"host": f"h{i % 50}"},
                    i * C1_SPACING_US,
                )
            )
        c1_ingest = time.perf_counter() - t0
        t0 = time.perf_counter()
        flushed = _eng.flush("bench")
        c1_flush = time.perf_counter() - t0
        _check(flushed == C1_N, f"c1 flush lost rows: {flushed}")
        # pruning pin on the engine-level twin of the timed HTTP query
        _day_sql = (
            "SELECT count(*) AS n, count(DISTINCT host) AS hosts "
            "FROM cpu WHERE timestamp >= '1970-01-16' "
            "AND timestamp < '1970-01-17'"
        )

        def _scan_num_files(df) -> int:
            df.collect()
            ep = df._jdf.queryExecution().executedPlan()
            total = 0
            s = ep.collectLeaves()
            for k in range(s.length()):
                m = s.apply(k).metrics()
                if m.contains("numFiles"):
                    total += m.apply("numFiles").value()
            return total

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            _pin_df = _eng.query("bench", _day_sql)
            files_read = _scan_num_files(_pin_df)
            files_total = _scan_num_files(
                _eng.query("bench", "SELECT count(*) AS n FROM cpu")
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        import contextlib as _ctl
        import io as _io

        _buf = _io.StringIO()
        with _ctl.redirect_stdout(_buf):
            _pin_df.explain(True)
        _check(
            "PartitionFilters" in _buf.getvalue(),
            "c1: day bounds did not reach the scan as PartitionFilters",
        )
        _check(
            files_read <= 2 and files_total >= 30,
            f"c1: pruning failed at volume ({files_read}/{files_total})",
        )
        _c = _mk_app(_eng).test_client()
        c1_day_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = _c.post(
                "/api/v1/query",
                json={
                    "namespace": "bench",
                    "format": "Json",
                    "query": _day_sql,
                },
            )
            c1_day_runs.append(time.perf_counter() - t0)
            got = json.loads(r.get_data())
            _check(
                r.status_code == 200
                and got == [{"n": c1_expected_day_n, "hosts": 50}],
                f"c1 day-bounded oracle mismatch: {got!r} != "
                f"n={c1_expected_day_n}",
            )
        c1_full_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = _c.post(
                "/api/v1/query",
                json={
                    "namespace": "bench",
                    "format": "Json",
                    "query": "SELECT count(*) AS n, "
                    "count(DISTINCT value) AS d FROM cpu",
                },
            )
            c1_full_runs.append(time.perf_counter() - t0)
            got = json.loads(r.get_data())
            _check(
                r.status_code == 200 and got == [{"n": C1_N, "d": C1_N}],
                f"c1 unbounded oracle mismatch: {got!r}",
            )
        _eng.wal.close()
    timings["c1_coldtier_day_agg_1m"] = round(min(c1_day_runs), 4)
    medians["c1_coldtier_day_agg_1m"] = round(
        statistics.median(c1_day_runs[1:] or c1_day_runs), 4
    )
    timings["c1_coldtier_full_agg_1m"] = round(min(c1_full_runs), 4)
    medians["c1_coldtier_full_agg_1m"] = round(
        statistics.median(c1_full_runs[1:] or c1_full_runs), 4
    )
    print(
        f"# c1_coldtier_day_agg_1m: {min(c1_day_runs):.3f}s day-bounded / "
        f"c1_coldtier_full_agg_1m: {min(c1_full_runs):.3f}s unbounded "
        f"(1M rows, 34 days; ingest {c1_ingest:.1f}s + flush "
        f"{c1_flush:.1f}s untimed; pruned {files_read}/{files_total} "
        f"files; oracles hold)",
        file=sys.stderr,
    )

    # host-speed calibration constants (r8): the text family drifted
    # +35% over r5→r8 on UNCHANGED code — bisect showed it is neither
    # registry size (lean import == full import) nor contention (idle
    # machine reproduces it): the host itself runs CPU-bound work
    # slower some rounds. These absolute single-core numbers let a
    # future round separate "the code got slower" from "the machine
    # got slower": compare query deltas against calib deltas first.
    import hashlib

    buf = b"x" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.md5()
    for _ in range(200):
        h.update(buf)
    calib_md5_mbps = round(200 / (time.perf_counter() - t0), 1)
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc += i * i
    calib_pyloop_sec = round(time.perf_counter() - t0, 4)

    # r9: MULTI-core calibration. The single-core constants above
    # cannot see a concurrent process eating a few of the 32 cores —
    # exactly the contention that slows 32-way Spark stages in a
    # driver session while leaving calib_md5_mbps untouched (r9
    # measured: equal single-core calib between the r8 driver run and
    # a clean r9 run, yet q83/q131 ran 16-21% faster clean). This
    # runs the same md5 loop on ALL cores at once via a process pool;
    # aggregate MB/s well below cores*single-core means the machine
    # was multi-core contended during the bench.
    import multiprocessing as mp

    ncpu = mp.cpu_count()
    with mp.Pool(ncpu) as pool:
        t0 = time.perf_counter()
        pool.map(_md5_worker, [50] * ncpu)
        calib_md5_par_mbps = round(
            ncpu * 50 / (time.perf_counter() - t0), 1
        )

    # r9 guard (VERDICT r8 task 6): the clean-subprocess w0 floor is
    # on record — 0.098s/20k writes (205k writes/s) at
    # calib_pyloop_sec 0.0964 (r8). If this run's w0 exceeds 2x that
    # floor after scaling by host speed, the subprocess itself ran
    # contended (something else was chewing the machine during the
    # bench): self-label the row instead of seeding another
    # two-round "ingest got slower" investigation on untouched code.
    W0_CLEAN_FLOOR_SEC = 0.098
    W0_FLOOR_CALIB_PYLOOP = 0.0964
    w0_budget = (
        2.0
        * W0_CLEAN_FLOOR_SEC
        * max(1.0, calib_pyloop_sec / W0_FLOOR_CALIB_PYLOOP)
    )
    w0_contended = timings["w0_ingest_20k_writes"] > w0_budget
    if w0_contended:
        print(
            f"# WARNING w0 {timings['w0_ingest_20k_writes']:.3f}s exceeds "
            f"{w0_budget:.3f}s (2x the r8 clean floor, calib-scaled): "
            "treat this row as contended, not as an ingest regression",
            file=sys.stderr,
        )

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except (ValueError, IndexError):
        sf = None
    noise = [
        (medians[n] - timings[n]) / timings[n]
        for n in medians
        if timings[n] > 0
    ]
    payload = {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "noise_band": round(sum(noise) / len(noise), 4) if noise else 0.0,
                "calib_md5_mbps": calib_md5_mbps,
                "calib_md5_par_mbps": calib_md5_par_mbps,
                "calib_pyloop_sec": calib_pyloop_sec,
                "w0_contended": w0_contended,
                "sf": sf,
            }
    # the driver archives only a 2000-char TAIL of this process's
    # output; at 58 headline queries the medians dict alone outgrows
    # that window. Persist the full payload next to the script so
    # round-over-round analysis (and the judge) always has the
    # complete record regardless of tail truncation.
    try:
        (Path(__file__).resolve().parent / "BENCH_LATEST_full.json").write_text(
            json.dumps(payload)
        )
    except OSError:
        pass
    print(json.dumps(payload))

    # r15 (VERDICT r14 task 8): a dedicated per-query line for any
    # consumer that scans FULL stdout rather than the 2000-char tail
    # (PERF_r14 came back with an empty per_query map — the parsed
    # line was the compact one, which carries no "queries"). This
    # line is additive: both maps, compact separators, full
    # precision. It CANNOT go in the final line — 73 query keys alone
    # are ~1,970 chars at 2dp with compact separators, so totals +
    # either map cannot both survive a 2000-char tail window; the
    # compact totals line must stay last and intact.
    print(
        json.dumps(
            {
                "metric": "headline_queries_per_query",
                "unit": "sec",
                "sf": sf,
                "queries": timings,
                "queries_median": medians,
            },
            separators=(",", ":"),
        )
    )

    # FINAL stdout line: a compact summary guaranteed to fit the
    # driver's 2000-char tail window (the full line above was cut
    # mid-string for three rounds running — BENCH_r{8,9,10}.json all
    # record parsed:null). Carries the headline total, the geomean
    # ratio + top-5 deltas vs the latest committed clean-bench
    # artifact, and the calibration trio; per-query detail lives in
    # BENCH_LATEST_full.json (committed) and the stderr log.
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        # purely median-based since r13 (ADVICE r12): w0/s1/m0 now
        # report real medians, so every timings entry has one (the
        # .get fallback keeps the field well-defined if a future row
        # forgets — then it degrades per-key, never silently drops)
        "value_median": round(
            sum(medians.get(k, v) for k, v in timings.items()), 4
        ),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "noise_band": payload["noise_band"],
        "calib_md5_mbps": calib_md5_mbps,
        "calib_md5_par_mbps": calib_md5_par_mbps,
        "calib_pyloop_sec": calib_pyloop_sec,
        "w0_contended": w0_contended,
        "full": "BENCH_LATEST_full.json",
    }
    try:
        import glob
        import math
        import re

        prevs = sorted(
            glob.glob(str(Path(__file__).resolve().parent / "BENCH_r*_clean*.json")),
            key=lambda p: (
                int(re.search(r"BENCH_r(\d+)", p).group(1)),
                p,
            ),
        )
        if prevs:
            prev = json.loads(Path(prevs[-1]).read_text())
            pq = prev.get("queries", prev)
            common = [
                n for n in timings
                if isinstance(pq.get(n), (int, float))
                and pq[n] > 0 and timings[n] > 0
            ]
            if common:
                ratios = {n: timings[n] / pq[n] for n in common}
                compact["vs_prev"] = Path(prevs[-1]).name
                compact["geomean_vs_prev_min"] = round(
                    math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios)),
                    4,
                )
            # PRIMARY round-over-round figure (r12, VERDICT r11 task
            # 4): the median-based geomean. Three consecutive rounds
            # spent min-of-N replays refuting phantom regressions
            # (q160-r9, q110-r10, q218/q214-r11) because a single
            # lucky/unlucky rep moves a min far more than a median;
            # the min-based figure stays alongside for continuity
            # with r01-r11 artifacts.
            pm = prev.get("queries_median", pq)
            mcommon = [
                n for n in medians
                if isinstance(pm.get(n), (int, float))
                and pm[n] > 0 and medians[n] > 0
            ]
            if mcommon:
                mratios = {n: medians[n] / pm[n] for n in mcommon}
                compact["geomean_vs_prev_median"] = round(
                    math.exp(
                        sum(math.log(r) for r in mratios.values())
                        / len(mratios)
                    ),
                    4,
                )
                top = sorted(
                    mratios, key=lambda n: abs(math.log(mratios[n]))
                )[-5:]
                compact["top_deltas_median"] = {
                    n: round(mratios[n], 3) for n in top
                }
                # r13 (VERDICT r12 task 5): host-speed-normalized
                # geomean. A driver box calibrating 33% slower made
                # r12's untouched code read as a 1.19x "regression";
                # time scales inversely with throughput, so the
                # environment-only expectation for the raw geomean is
                # calib_prev/calib_cur — divide it out. Raw stays
                # beside it; the multi-core md5 figure is the scaler
                # because it tracks what slows 32-way Spark stages.
                prev_calib = prev.get("calib_md5_par_mbps")
                if prev_calib and calib_md5_par_mbps:
                    compact["calib_ratio_vs_prev"] = round(
                        prev_calib / calib_md5_par_mbps, 4
                    )
                    compact["geomean_vs_prev_median_calib"] = round(
                        compact["geomean_vs_prev_median"]
                        * calib_md5_par_mbps
                        / prev_calib,
                        4,
                    )
    except (OSError, ValueError, KeyError, AttributeError):
        pass
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
