#!/usr/bin/env python
"""r7: why does the candidate-doc shingle-set projection cost 7x the
full-corpus kernel? Decompose: semi-join, filter placement,
array_distinct, and H1 (outer-ref re-evaluation in HOF lambdas)."""

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
    print(f"{name:52s} {best:8.3f}s", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = get_spark("r07_sets_probe")
    spark.conf.set("spark.cpg.kernel.width", "8")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)

    sig = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sig).cache()
    pairs.count()
    cand_ids = (
        pairs.select(F.col("a").alias("doc_id"))
        .unionByName(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
        .cache()
    )
    cand_ids.count()

    sh = dedup.shingle_hash_array(F.col("text"), 3)
    semi = docs.join(cand_ids, "doc_id", "left_semi")

    timeit(spark, "semi-join only (count text len)",
           semi.select("doc_id", F.length("text").alias("l")))
    timeit(spark, "semi + raw shingle array", semi.select("doc_id", sh.alias("shs")))
    timeit(spark, "semi + array_distinct",
           semi.select("doc_id", F.array_distinct(sh).alias("shs")))
    timeit(spark, "semi + array_distinct + filter",
           semi.select("doc_id", F.array_distinct(sh).alias("shs"))
               .filter(F.size("shs") > 0))
    timeit(spark, "no-semi + array_distinct + filter",
           docs.select("doc_id", F.array_distinct(sh).alias("shs"))
               .filter(F.size("shs") > 0))
    # candidate token mass vs corpus token mass
    from cpg_spark.operators.textstats import doc_tokens
    tot = docs.select(F.sum(F.size(doc_tokens(F.col("text")))).alias("n")).collect()[0]["n"]
    cnd = semi.select(F.sum(F.size(doc_tokens(F.col("text")))).alias("n")).collect()[0]["n"]
    print("tokens total", tot, "tokens candidates", cnd, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
