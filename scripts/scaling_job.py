"""One measured KG-pipeline run at a given parallelism (invoked by
scaling_bench.py in a fresh JVM per cluster size).

Usage: python scripts/scaling_job.py <pages_parquet> <cores>
Prints one JSON line: {"cores": N, "wall_sec": s, "triples": m, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pages_path, cores = sys.argv[1], int(sys.argv[2])

    from cpg_spark.session import get_spark
    from cpg_spark.synth_spark import alias_dict_df

    from bench import kg_chain

    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]")
    pages = spark.read.parquet(pages_path)
    adict = alias_dict_df(spark)
    n_pages = pages.count()

    # 1 warmup (JIT/codegen — amortizes to zero on a long-running
    # cluster) + 3 measured runs, report the MIN: the sandbox box is a
    # shared VM where external contention only ever adds time, so the
    # minimum is the un-contended capability (scaling_bench.py further
    # interleaves several JVM sessions per level)
    runs = []
    for i in range(4):
        agg = kg_chain(spark, pages, adict)
        t0 = time.monotonic()
        triples = agg.count()
        if i > 0:
            runs.append(time.monotonic() - t0)
        spark.catalog.clearCache()
    wall = min(runs)

    print(
        json.dumps(
            {
                "cores": cores,
                "wall_sec": round(wall, 3),
                "runs_sec": [round(r, 3) for r in runs],
                "pages": n_pages,
                "triples": triples,
                "pages_per_sec": round(n_pages / wall, 1),
                "triples_per_sec": round(triples / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
