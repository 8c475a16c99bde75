#!/usr/bin/env python
"""Capture .explain('formatted') for named registry queries into
plans/r07/<name>_<tag>.txt (the r7 optimization-round evidence files).

Usage: python scripts/r07_capture_plans.py before q1 q2 ...
       python scripts/r07_capture_plans.py after  q1 q2 ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cpg_spark.queries import QUERIES
    from cpg_spark.session import get_spark

    spark = get_spark("r07_plans")
    spark.conf.set("spark.cpg.kernel.width", "8")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _ = QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
