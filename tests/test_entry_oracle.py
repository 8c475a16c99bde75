"""Driver-contract test: every queries() entry has a matching oracle and
agrees with DuckDB at sf0.001 (the full sf0.01 sweep lives in
scripts/check_oracles.py; this is the fast regression guard)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as se
from cpg_spark.oracle_check import compare_query, register_views

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_views(con, SF_DIR)
    return con


def test_contract_shape():
    qs, oracles = se.queries(), se.oracle_sql()
    assert len(qs) >= 25
    # every oracle key must be a query key
    assert set(oracles) <= set(qs)
    # only genuinely iterative / non-SQL-expressible ops may be rows-only
    rows_only_allowed = {"sim_ivf_kmeans"}
    assert set(qs) - set(oracles) <= rows_only_allowed


def test_entry_returns_rows(spark):
    df = se.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj", "n_evidence"}


@pytest.mark.parametrize(
    "name",
    [
        "pass_stats_agg",
        "link_bestpick",
        "canon_cc",
        "cooccur_parts",
        "events_sessions",
        "kg_doc_cooccur",
        "ts_lang_id",
        "dd_minhash",
        "dd_jaccard",
        "dd_simhash",
        "sim_cosine_topk",
        "sim_lsh_buckets",
    ],
)
def test_query_matches_oracle(spark, duck, name):
    fn = se.queries()[name]
    sql = se.oracle_sql()[name]
    diag = compare_query(spark, duck, fn, sql, SF_DIR)
    assert diag is None, f"{name}: {diag}"
