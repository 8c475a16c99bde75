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
    rows_only_allowed = {"sim_ivf_kmeans", "sim_pq_trained_recall"}
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


def test_registry_window_schedule():
    """The driver checks the FIRST 50 registry entries (r3 verdict #1:
    head-insertions silently rotated 10 green queries out of the gate).
    Guard the documented schedule: every entry that has never had a
    green driver row (r4's tier 1) must sit inside the window, and the
    tail may only hold the thrice-checked r1+r2+r3 stable set."""
    from cpg_spark.queries import QUERIES

    names = list(QUERIES)
    window, tail = set(names[:50]), names[50:]
    never_checked = {
        "dd_contamination", "sim_ann_recall", "sim_pq_encode",
        "sim_pq_topk", "sim_pq_recall", "sim_pq_trained_recall",
        "eog_borders", "eog_dfa_branched", "eval_loop_unroll",
        "eval_subscript", "sim_ivf_probe_topk", "kg_jsonld",
        "ts_lm_score", "dd_chunk_dedup",
    }
    assert never_checked <= window, never_checked - window
    thrice_checked = {
        "pass_stats_agg", "link_bestpick", "region_revenue",
        "unresolved_refs", "nationkey_union", "canon_cc", "reach_bfs",
        "events_order_check", "eog_order_edges", "cooccur_parts",
        "topk_customers", "order_supp_set", "hotspot_scan",
        "brand_price_rank", "events_hourly", "events_sessions",
        "kg_doc_mentions", "kg_doc_chunks", "kg_doc_cooccur",
        "ts_token_stats", "ts_quality", "ts_lang_id", "ts_fingerprint",
        "dd_exact", "dd_minhash", "dd_lsh_pairs", "dd_jaccard",
    }
    not_stable = [n for n in tail if n not in thrice_checked]
    assert not not_stable, f"tail must stay thrice-checked-only: {not_stable}"
