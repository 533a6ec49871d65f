#!/usr/bin/env python
"""Capture ``explain("formatted")`` for declared queries into
plans/<round>/<name>_<side>.txt.

Usage:
    python tools/capture_plans.py <round_dir> <side> [name ...]

With no names, captures every READ/pipeline query (skips the write_*
lifecycle rows, whose ``build`` executes writes — their plan is just the
merged read of a scratch table; write-side evidence is the writer-input
plan probe, tools/capture_writer_plan.py).

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    round_dir, side = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(round_dir, exist_ok=True)

    from hudi_rs_spark.session import get_spark
    from hudi_rs_spark.workloads import load_all

    spark = get_spark("hudi-rs-spark-plan-capture")
    specs = load_all()
    if not names:
        names = [n for n in specs if not n.startswith("write_")]
    for name in names:
        spec = specs[name]
        df = spec.build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(round_dir, f"{name}_{side}.txt")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print(f"captured {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
