"""Probe: how much of a small-sf query timing is PLANNING (analysis +
optimization + physical planning + codegen) vs execution, for the
composed-kernel dedup queries whose expression trees grew in r7.

Usage: python scripts/r07_plancost_probe.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        "dd_contamination",
        "dd_minhash",
        "dd_chunk_dedup",
        "ts_fingerprint",
    ]

    from cpg_spark.queries import QUERIES
    from cpg_spark.session import get_spark

    spark = get_spark("plancost-probe")
    spark.conf.set("spark.cpg.kernel.width", "8")

    # warmup
    QUERIES["pass_stats_agg"][0](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = QUERIES[name][0]
        for run in range(2):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t_build = time.monotonic() - t0
            t0 = time.monotonic()
            # force full analysis+optimization+physical planning+codegen
            # without running a job
            df._jdf.queryExecution().executedPlan()
            t_plan = time.monotonic() - t0
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.monotonic() - t0
            spark.catalog.clearCache()
            print(
                f"{name:20s} run{run}: build={t_build:6.3f} "
                f"plan={t_plan:6.3f} exec={t_exec:6.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
