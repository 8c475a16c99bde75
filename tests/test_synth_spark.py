"""The distributed corpus generator must satisfy the same per-row
invariants as the driver-side golden generator: byte-identical
extraction, deterministic across parallelism and partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpg_spark.functions.text import extract_text_col
from cpg_spark.synth_spark import synth_pages


def test_extraction_roundtrips_byte_identical(spark):
    pages = synth_pages(spark, 300)
    bad = pages.filter(
        extract_text_col(F.col("html")) != F.col("text")
    ).count()
    assert bad == 0


def test_generation_deterministic_across_partitioning(spark):
    a = synth_pages(spark, 200).orderBy("url").collect()
    b = synth_pages(spark, 200).repartition(13).orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_corpus_shape(spark):
    pages = synth_pages(spark, 500)
    langs = {r["lang"] for r in pages.select("lang").distinct().collect()}
    assert "zz" in langs and "en" in langs  # non-target lang present
    n_empty = pages.filter(F.trim(F.col("text")) == "").count()
    assert n_empty > 0  # robustness path exercised
