#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries to
plans/r14/<query>_{before,after}.txt.  Usage:
    python plans/r14/capture_plans.py before [q1 q2 ...]
Plans are built lazily (no execution), so this is driver-only work —
but operators with eager internals (persist+count, training collects,
localCheckpoints) do run those jobs to produce the final frame.
"""
import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402  (HEADLINE list)
from lynx_spark.session import get_spark  # noqa: E402
from lynx_spark.plans.analytics import REGISTRY  # noqa: E402

def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = ROOT / "plans" / "r14"
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print(f"ok {name}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()

if __name__ == "__main__":
    main()
