"""Deterministic sampling + corpus term weighting operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpg_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    top_k_per_group,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("zz")
        .alias("lang"),
    )


def test_hash_sample_deterministic_and_partition_independent(spark):
    docs = _docs(spark)
    a = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), "doc_id", 0.3).collect()
    )
    assert a == b and 0 < len(a) < 500
    # rate ~0.3 within a loose band (hash uniformity, not exact)
    assert 0.15 < len(a) / 500 < 0.45
    # salt decorrelates
    c = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, salt="x").collect())
    assert a != c


def test_stratified_rates_respected(spark):
    docs = _docs(spark, 3000)
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.1}, default_rate=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "zz" not in by_lang  # default 0 drops the stratum
    assert 0.35 < by_lang["en"] / 1000 < 0.65
    assert 0.02 < by_lang["de"] / 1000 < 0.2
    # subset property: en@0.1 sample is contained in en@0.5 sample
    small = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "doc_id", "lang", {"en": 0.1}, default_rate=0.0
        ).collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "doc_id", "lang", {"en": 0.5}, default_rate=0.0
        ).collect()
    }
    assert small <= big


def test_top_k_per_group(spark):
    rows = [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    out = top_k_per_group(df, ["g"], "score", 2, tie_break="id")
    got = {(r["g"], r["id"]) for r in out.collect()}
    assert got == {("a", 2), ("a", 3), ("b", 4)}


def test_tfidf_top_terms_golden(spark):
    """Hand-checked corpus: rare term outranks common term."""
    from cpg_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "banana banana date"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=1)
    top = {r["doc_id"]: (r["term"], r["score"]) for r in out.collect()}
    # doc 1: apple tf=2 df=1 -> 6.0 beats banana tf=1 df=3 -> 1.0
    assert top[1] == ("apple", 6.0)
    assert top[2] == ("cherry", 3.0)
    assert top[3][0] == "date" or top[3] == ("banana", 2.0)
    # banana: tf=2, df=3 -> 2.0 ; date: tf=1, df=1 -> 3.0 -> date wins
    assert top[3] == ("date", 3.0)
