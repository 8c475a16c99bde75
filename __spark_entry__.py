"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG co-occurrence triple query at
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity, text analysis); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for each (cpg_spark/queries.py holds both sides, column-aliased
identically).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cpg_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: extract → link →
    co-occurrence triple emission with evidence counts."""
    fn, _ = QUERIES["kg_doc_cooccur"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + training-data
    ops). Each callable takes (spark, sf_dir) and returns a DataFrame."""
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query, on the pre-registered views
    (region nation customer supplier part orders lineitem events
    documents embeddings)."""
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
