#!/usr/bin/env python
"""r7: stage-level isolation of the dd_* composites (guide §1.4 noop
sink, §1.5 labels). Times each sub-stage of dd_minhash /
dd_jaccard_verify / dd_jaccard_capped / curation at the bench's exact
shapes (t_par width 8)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cpg_spark.operators import dedup
from cpg_spark.session import get_spark


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, name, df, reps=2):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        force(df)
        best = min(best, time.monotonic() - t0)
        spark.catalog.clearCache()
    print(f"{name:44s} {best:8.3f}s", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = get_spark("r07_dd_profile")
    spark.conf.set("spark.cpg.kernel.width", "8")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)

    ex = dedup.exploded_shingles(docs)
    timeit(spark, "exploded_shingles", ex)

    sig = dedup.minhash_signatures(docs)
    timeit(spark, "minhash_signatures(full)", sig)

    # wide agg without the stack
    from cpg_spark.functions.hashing import CHAR_POLY_P

    aggs = [
        F.min(((2 * k + 1) * F.col("sh") + 1000003 * k) % CHAR_POLY_P).alias(
            f"h{k}"
        )
        for k in range(dedup.MINHASH_K)
    ]
    timeit(spark, "minhash wide agg (no stack)", ex.groupBy("doc_id").agg(*aggs))

    timeit(spark, "shingle_index(distinct)", dedup.shingle_index(docs))

    cand = dedup.lsh_candidate_pairs(sig)
    timeit(spark, "lsh_candidate_pairs", cand)

    # materialize cand so verify timing excludes candidate generation
    cand_mat = cand.cache()
    n_cand = cand_mat.count()
    print(f"n_cand={n_cand}", flush=True)
    timeit(spark, "jaccard_for_pairs(given cand)",
           dedup.jaccard_for_pairs(docs, cand_mat), reps=2)

    # the bench shape: cache() inside the same action
    def verify_bench():
        sig2 = dedup.minhash_signatures(docs)
        c2 = dedup.lsh_candidate_pairs(sig2).cache()
        return dedup.jaccard_for_pairs(docs, c2)

    spark.catalog.clearCache()
    for i in range(2):
        spark.sparkContext.setJobDescription(f"dd_jaccard_verify bench-shape {i}")
        t0 = time.monotonic()
        force(verify_bench())
        print(f"dd_jaccard_verify bench-shape              {time.monotonic()-t0:8.3f}s", flush=True)
        spark.catalog.clearCache()

    # capped jaccard breakdown
    idx = dedup.shingle_index(docs)
    from pyspark.sql import Window

    idxf = (
        idx.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .filter(F.col("__df") <= 100)
        .drop("__df")
    )
    timeit(spark, "capped: idx+df-window-filter", idxf)
    timeit(spark, "dd_jaccard_capped(full)",
           dedup.jaccard_pairs(docs, min_jaccard=0.5, max_doc_freq=100))
    spark.stop()


if __name__ == "__main__":
    main()
