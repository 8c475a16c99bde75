"""Probe: Python-side DataFrame BUILD time (Column-tree construction via
py4j) for every headline query — the fixed per-call driver overhead the
bench pays inside its timed region.

Usage: python scripts/r07_buildcost_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from cpg_spark.queries import QUERIES
    from cpg_spark.session import get_spark

    sys.path.insert(0, "/root/repo")
    import bench as bench_mod

    spark = get_spark("buildcost-probe")
    spark.conf.set("spark.cpg.kernel.width", "8")
    QUERIES["pass_stats_agg"][0](spark, sf_dir)  # warm py4j

    rows = []
    for name in bench_mod.HEADLINE:
        fn = QUERIES[name][0]
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir)
            best = min(best, time.monotonic() - t0)
        rows.append((best, name))
    for sec, name in sorted(rows, reverse=True):
        print(f"{name:22s} build={sec:6.3f}")
    print(f"total_build={sum(r[0] for r in rows):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
