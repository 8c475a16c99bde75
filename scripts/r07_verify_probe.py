#!/usr/bin/env python
"""r7: isolate jaccard_for_pairs cost components and test the
candidate-confined inverted-index reformulation (identical results)."""

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
    print(f"{name:46s} {best:8.3f}s", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = get_spark("r07_verify_probe")
    spark.conf.set("spark.cpg.kernel.width", "8")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)

    sig = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sig).cache()
    print("n_pairs", pairs.count(), flush=True)

    cand_ids = (
        pairs.select(F.col("a").alias("doc_id"))
        .unionByName(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    print("n_cand_docs", cand_ids.count(), flush=True)

    sets = (
        docs.join(cand_ids, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.array_distinct(
                dedup.shingle_hash_array(F.col("text"), 3)
            ).alias("shs"),
        )
        .filter(F.size("shs") > 0)
    )
    timeit(spark, "sets (kernel on candidate docs)", sets)

    a_sets = sets.select(F.col("doc_id").alias("a"), F.col("shs").alias("a_shs"))
    b_sets = sets.select(F.col("doc_id").alias("b"), F.col("shs").alias("b_shs"))
    joined = pairs.join(a_sets, "a").join(b_sets, "b")
    timeit(
        spark,
        "joins only (sizes, no intersect)",
        joined.select("a", "b", (F.size("a_shs") + F.size("b_shs")).alias("s")),
    )
    common = F.size(F.array_intersect(F.col("a_shs"), F.col("b_shs")))
    union = F.size("a_shs") + F.size("b_shs") - common
    timeit(
        spark,
        "full (joins + array_intersect)",
        joined.select("a", "b", (common.cast("double") / union).alias("jaccard")),
    )

    # reformulation: candidate-confined inverted index join
    idx_c = (
        docs.join(cand_ids, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(dedup.shingle_hash_array(F.col("text"), 3))
            ).alias("sh"),
        )
    )
    sizes = idx_c.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = pairs.join(
        idx_c.withColumnRenamed("doc_id", "a"), "a"
    )  # (a, b, sh) per a-shingle
    n_common = (
        a_sh.join(idx_c.select(F.col("doc_id").alias("b"), "sh"), ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    out2 = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .join(n_common, ["a", "b"], "left")
        .select(
            "a",
            "b",
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce("n_common", F.lit(0)))
            ).alias("jaccard"),
        )
    )
    timeit(spark, "reformulated inverted-index verify", out2)

    # equivalence check
    cur = dedup.jaccard_for_pairs(docs, pairs)
    d1 = cur.exceptAll(out2).count()
    d2 = out2.exceptAll(cur).count()
    print("sym_diff", d1 + d2, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
