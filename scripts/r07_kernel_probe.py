#!/usr/bin/env python
"""r7 optimization probe: isolate the shingle-hash kernel cost and test
the two hypotheses driving the dedup-family rewrite:

  H1  outer-scope expressions referenced inside higher-order-function
      lambdas are RE-EVALUATED per element (no interpreted subexpression
      elimination), so the current shingle kernel re-runs
      regexp_extract_all once per shingle position;
  H2  the per-shingle char-fold (split + aggregate over single-char
      strings) is far more expensive than composing per-token hashes
      with the polynomial identity h(a||b) = (h(a)*31^len(b)+h(b)) % P.

Each variant is forced through the noop sink (guide §1.4) and labelled
(§1.5). Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/r07_kernel_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cpg_spark.functions.hashing import CHAR_POLY_P, char_poly_hash_col
from cpg_spark.operators.textstats import doc_tokens
from cpg_spark.session import get_spark

P = CHAR_POLY_P

_POW31 = [1]
for _ in range(256):
    _POW31.append(_POW31[-1] * 31 % P)


def let(col, f):
    """Pure-SQL let binding: evaluate `col` once, bind it in f."""
    return F.element_at(F.transform(F.array(col), f), 1)


def char_poly_pow_col(s):
    """31^length(s) mod P (lookup for len<=256, fold beyond)."""
    arr = F.array(*[F.lit(x).cast("long") for x in _POW31])
    L = F.length(s)
    fold = F.aggregate(
        F.sequence(F.lit(1), F.greatest(L, F.lit(1))),
        F.lit(1).cast("long"),
        lambda acc, _: (acc * 31) % P,
    )
    return F.when(L <= 256, F.element_at(arr, L + 1)).otherwise(fold)


def shingles_current(text):
    toks = doc_tokens(text)
    m = F.size(toks) - 2
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(m - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
    )
    return F.when(m > 0, F.transform(shingles, char_poly_hash_col)).otherwise(
        F.array().cast("array<long>")
    )


def shingles_let_strings(text):
    """let-bind toks, still hash the joined shingle string per position."""
    def inner(toks):
        m = F.size(toks) - 2
        shingles = F.transform(
            F.sequence(F.lit(0), F.greatest(m - 1, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
        )
        return F.when(m > 0, F.transform(shingles, char_poly_hash_col)).otherwise(
            F.array().cast("array<long>")
        )

    return let(doc_tokens(text), inner)


def shingles_composed(text):
    """let-bind toks, hash each token once, compose shingle hashes."""
    def with_toks(toks):
        m = F.size(toks) - 2

        def with_th(th):
            def with_tp(tp):
                def sh_at(i):
                    acc = F.element_at(th, i)
                    for j in range(1, 3):
                        acc = (acc * 31 + 32) % P
                        acc = (
                            acc * F.element_at(tp, i + j)
                            + F.element_at(th, i + j)
                        ) % P
                    return acc

                return F.when(
                    m > 0,
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(m, F.lit(1))), sh_at
                    ),
                ).otherwise(F.array().cast("array<long>"))

            return let(F.transform(toks, char_poly_pow_col), with_tp)

        return let(F.transform(toks, char_poly_hash_col), with_th)

    return let(doc_tokens(text), with_toks)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, name, df, reps=2):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        force(df)
        best = min(best, time.monotonic() - t0)
    print(f"{name:40s} {best:8.3f}s")
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = get_spark("r07_kernel_probe")
    spark.conf.set("spark.cpg.kernel.width", "8")
    docs8 = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
    docs32 = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)

    variants = {
        "shingle_current@8": docs8.select(
            "doc_id", F.explode(shingles_current(F.col("text"))).alias("sh")
        ),
        "shingle_let_strings@8": docs8.select(
            "doc_id", F.explode(shingles_let_strings(F.col("text"))).alias("sh")
        ),
        "shingle_composed@8": docs8.select(
            "doc_id", F.explode(shingles_composed(F.col("text"))).alias("sh")
        ),
        "shingle_composed@32": docs32.select(
            "doc_id", F.explode(shingles_composed(F.col("text"))).alias("sh")
        ),
        "shingle_current@32": docs32.select(
            "doc_id", F.explode(shingles_current(F.col("text"))).alias("sh")
        ),
        "tokenize_only@8": docs8.select(
            "doc_id", F.size(doc_tokens(F.col("text"))).alias("n")
        ),
        "token_hash_only@8": docs8.select(
            "doc_id",
            F.aggregate(
                F.transform(doc_tokens(F.col("text")), char_poly_hash_col),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("s"),
        ),
    }
    # correctness: composed must equal current exactly
    cur = variants["shingle_current@8"]
    comp = variants["shingle_composed@8"]
    n_cur = cur.count()
    n_diff = cur.exceptAll(comp).count() + comp.exceptAll(cur).count()
    print(f"rows={n_cur} sym_diff={n_diff}")
    assert n_diff == 0, "composed shingle hash differs from current!"

    for name, df in variants.items():
        timeit(spark, name, df)
    spark.stop()


if __name__ == "__main__":
    main()
