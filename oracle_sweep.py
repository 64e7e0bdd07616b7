#!/usr/bin/env python
"""Full-registry DuckDB-oracle sweep at an arbitrary scale dir.

The driver's correctness gate and tests/test_queries_oracle.py sweep
sf0.01/sf0.1; this script is the 10x hardening pass (VERDICT r11 task
1): point it at the synthesized sf1 (`python scale_check.py` writes
/tmp/lynx_scale/x10) and it runs EVERY registry entry Spark-side AND
DuckDB-side, comparing row count, column names, and exact cell values
(order-insensitive, columns sorted by name) — the identical canonical
form the driver hashes. Scale-dependent correctness bugs (int64
overflow in decimal-grid sums, quantile-grid edges, LSH bucket-cap
truncation changing survivors) are exactly the class the small-SF
sweeps cannot see.

    SWEEP_SF_DIR=/tmp/lynx_scale/x10 python oracle_sweep.py

Progress streams to SWEEP_OUT (default /tmp/oracle_sweep.jsonl, one
JSON line per query as it finishes, resumable via SWEEP_RESUME=1);
the final stdout line is one JSON summary.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/tmp/lynx_scale/x10")
OUT = Path(os.environ.get("SWEEP_OUT", "/tmp/oracle_sweep.jsonl"))
RESUME = os.environ.get("SWEEP_RESUME", "0") == "1"
ONLY = [s for s in os.environ.get("SWEEP_ONLY", "").split(",") if s]


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # IEEE -0.0 == 0.0 numerically; the string
            # forms differ ('-0.0' vs '0.0') and the jittered-x10
            # sweep showed round() can land on opposite zero signs
            # across engines for values that are bit-equal inputs —
            # a harness artifact, not an engine disagreement
        return v
    return v


def _rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(str(_normalize(row[i])) for i in order) for row in rows
    )


def main() -> None:
    from lynx_spark.plans.analytics import REGISTRY
    from lynx_spark.session import get_spark
    from lynx_spark.sources.tables import TABLES

    spark = get_spark("oracle_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # SWEEP_ANSI=1 (r13, VERDICT r12 task 4): run the whole registry
    # under spark.sql.ansi.enabled=true, where every divide-by-zero /
    # overflow / invalid-cast that non-ANSI mode folds to NULL becomes
    # a hard error. The q260/q272 NULLIF class was found ad hoc; this
    # sweep finds every remaining unguarded site mechanically.
    if os.environ.get("SWEEP_ANSI", "0") == "1":
        spark.conf.set("spark.sql.ansi.enabled", "true")
    # SWEEP_EXTRA_CONF="k=v,k=v" (r13): arbitrary runtime-conf
    # perturbations — the full-registry generalization of the
    # conftest hook (tests/conftest.py) used for AQE-off /
    # codegen-off robustness sweeps: different physical plans,
    # identical results required.
    for kv in filter(None, os.environ.get("SWEEP_EXTRA_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())

    con = duckdb.connect()
    # a pathological (quadratic-at-scale) oracle must ERROR cleanly,
    # not eat the disk until the Spark side's shuffle writes start
    # failing too (r12: the uncapped kNN oracle and q167's recursive
    # replay each spilled 40-70 GB of temp before this guard existed)
    budget = os.environ.get("SWEEP_DUCK_BUDGET")
    if not budget:
        # default scales with the host: the floor (24GiB) is plenty at
        # any tested SF with replica/real data, but the IVF-PQ oracles
        # need ~60GiB when every embedding vector is distinct
        # (SWEEP_jitter_r13.json) — on a big box, don't make the
        # operator rediscover that; on a small box, keep the guard
        try:
            avail_kb = next(
                int(line.split()[1])
                for line in open("/proc/meminfo")
                if line.startswith("MemAvailable")
            )
            budget = f"{max(24, min(64, int(avail_kb / 2097152)))}GiB"
        except (OSError, StopIteration, ValueError):
            budget = "24GiB"
    for pragma in (
        "SET temp_directory='/tmp/duckdb_sweep_spill'",
        f"SET max_temp_directory_size='{budget}'",
        f"SET memory_limit='{budget}'",
    ):
        try:
            con.sql(pragma)
        except duckdb.Error:
            pass  # older DuckDB without the setting
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        src = f"{p}/**/*.parquet" if p.is_dir() else str(p)
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    done: set[str] = set()
    if RESUME and OUT.exists():
        for line in OUT.read_text().splitlines():
            try:
                done.add(json.loads(line)["name"])
            except (ValueError, KeyError):
                pass
    elif OUT.exists():
        OUT.unlink()

    # ADVICE r12: validate SWEEP_ONLY up front — an unknown name used
    # to raise KeyError at REGISTRY[name] outside the per-query try,
    # aborting the sweep this script promises never aborts
    unknown = [n for n in ONLY if n not in REGISTRY]
    if unknown:
        sys.exit(f"SWEEP_ONLY names not in REGISTRY: {unknown}")
    names = ONLY or list(REGISTRY)
    n_pass = n_fail = n_rows_only = 0
    fails: list[str] = []
    for i, name in enumerate(names):
        if name in done:
            continue
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        row: dict = {"name": name}
        try:
            sdf = spec.fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            row["spark_rows"] = len(srows)
            row["spark_sec"] = round(time.perf_counter() - t0, 2)
            if spec.oracle is None:
                # unreachable since r13 (the q() decorator rejects
                # oracle-less registrations); kept as a loud failure
                # rather than the old half-tautological "ok" check
                row["status"] = "fail"
                row["why"] = "registry entry without an oracle"
            else:
                t1 = time.perf_counter()
                rel = con.sql(spec.oracle)
                dcols = list(rel.columns)
                drows = rel.fetchall()
                row["duck_sec"] = round(time.perf_counter() - t1, 2)
                if sorted(scols) != sorted(dcols):
                    row["status"] = "fail"
                    row["why"] = f"cols {sorted(scols)} vs {sorted(dcols)}"
                elif len(srows) != len(drows):
                    row["status"] = "fail"
                    row["why"] = f"rows {len(srows)} vs {len(drows)}"
                else:
                    sset = _rowset(scols, srows)
                    dset = _rowset(dcols, drows)
                    if sset == dset:
                        row["status"] = "pass"
                    else:
                        row["status"] = "fail"
                        row["why"] = "value diff: " + repr(
                            [
                                (a, b)
                                for a, b in zip(sset, dset)
                                if a != b
                            ][:3]
                        )
        except Exception as e:  # noqa: BLE001 — sweep must not abort
            row["status"] = "error"
            row["why"] = f"{type(e).__name__}: {e}"[:500]
        spark.catalog.clearCache()
        if row["status"] == "pass":
            n_pass += 1
        elif row["status"] == "rows_only":
            n_rows_only += 1
        else:
            n_fail += 1
            fails.append(name)
        with OUT.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(
            f"[{i + 1}/{len(names)}] {name}: {row['status']}",
            file=sys.stderr,
            flush=True,
        )
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "total": len(names),
                "pass": n_pass,
                "rows_only": n_rows_only,
                "fail": n_fail,
                "failed_names": fails,
            }
        )
    )


if __name__ == "__main__":
    main()
