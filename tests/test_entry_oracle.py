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
    rows_only_allowed = {
        "sim_ivf_kmeans", "sim_pq_trained_recall", "sim_pq_trained_cmp",
    }
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
        "cooccur_parts", "dd_exact", "kg_doc_mentions", "kg_doc_cooccur",
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
    Guard the documented r5 schedule: entries with zero or one green
    driver row must sit inside the window (tiers 1-2), everything whose
    implementation changed in r5 must be re-checked (tier 3), and the
    tail may only hold entries with >=3 green rows on record."""
    from cpg_spark.queries import QUERIES

    names = list(QUERIES)
    window, tail = set(names[:50]), names[50:]
    never_checked = {
        "kg_jsonld_graph", "sim_ivf_fitted_assign", "mm_payload_dedup",
        "dd_anchor_dedup", "sim_pq_trained_cmp", "ts_gopher_quality",
        "kg_pagerank", "kg_url_curation", "kg_fuse_sources",
        "ts_weighted_sample", "kg_snapshot_diff", "mm_frame_dedup",
        "sim_ivfpq_topk", "kg_frontend_dispatch",
    }
    assert never_checked <= window, never_checked - window
    once_checked = {
        "dd_contamination", "sim_ann_recall", "sim_pq_encode",
        "sim_pq_topk", "sim_pq_recall", "sim_pq_trained_recall",
        "eog_borders", "eog_dfa_branched", "eval_loop_unroll",
        "eval_subscript", "sim_ivf_probe_topk", "kg_jsonld",
        "ts_lm_score", "dd_chunk_dedup",
    }
    assert once_checked <= window, once_checked - window
    changed_r5 = {
        "sim_ivf_assign", "sim_ivf_kmeans", "eval_ops_full",
        "eval_set_ops", "eval_const_fold", "eval_multi_sets",
    }
    assert changed_r5 <= window, changed_r5 - window
    # brand_price_rank / events_hourly / link_bestpick / events_sessions
    # were red in r1 (2 green rows) — they stay windowed until
    # thrice-green
    assert {
        "brand_price_rank", "events_hourly", "link_bestpick",
        "events_sessions",
    } <= window
    thrice_checked = {
        # r1+r2+r3 (not yet rotated back — cycle these in r6)
        "topk_customers", "order_supp_set", "hotspot_scan",
        "events_order_check", "eog_order_edges", "reach_bfs",
        "nationkey_union", "unresolved_refs", "region_revenue",
        "cooccur_parts", "dd_exact", "kg_doc_mentions", "kg_doc_cooccur",
        "events_order_check",
        "kg_doc_chunks", "ts_token_stats", "ts_quality", "ts_lang_id",
        "ts_fingerprint", "dd_minhash", "dd_lsh_pairs", "dd_jaccard",
        # all four rounds green
        "pass_stats_agg", "canon_cc",
        # green in three of r1/r2/r4
        "dd_simhash", "dd_embedding_neardup", "salted_count",
        "sim_cosine_topk", "sim_lsh_buckets",
        # r2+r3+r4
        "link_scope_chain", "link_scored", "link_imports",
        "graph_compress", "canon_scc", "eog_reach_live",
        "link_fptr_calls", "dfg_reaching_defs", "qt_forall_witness",
        "sa_grammar_accept", "sa_dfg_grammar",
    }
    not_stable = [n for n in tail if n not in thrice_checked]
    assert not not_stable, f"tail must stay thrice-checked-only: {not_stable}"
