"""Physical-plan regression tests: the scale properties the 100 TB
story depends on — filter/projection pushdown to the scan, broadcast
joins where a small side exists, no accidental sort-merge or cartesian
joins — asserted on `explain` output so a refactor cannot silently
regress them."""

from __future__ import annotations

import contextlib
import io

import pytest

from cpg_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def plan(spark, name: str) -> str:
    df = QUERIES[name][0](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    cache: dict[str, str] = {}

    def get(name: str) -> str:
        if name not in cache:
            cache[name] = plan(spark, name)
        return cache[name]

    return get


def test_hotspot_scan_pushdown(plans):
    p = plans("hotspot_scan")
    assert "PushedFilters:" in p
    assert "GreaterThanOrEqual(p_size,10)" in p
    # projection pruned to the 4 selected columns
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "p_partkey" in read and "p_retailprice" not in read


def test_region_revenue_all_broadcast(plans):
    p = plans("region_revenue")
    # tree nodes only ("BroadcastHashJoin Inner ..."); the details section
    # repeats each node header without the join type on the same line
    assert p.count("BroadcastHashJoin Inner") == 3
    assert "SortMergeJoin" not in p


def test_kg_doc_mentions_broadcast_no_smj(plans):
    """The mention stream joins the alias dict by broadcast — the big
    side must never shuffle for the join."""
    p = plans("kg_doc_mentions")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_cosine_topk_broadcasts_query_side(plans):
    """Brute-force top-k: the tiny query side broadcasts (nested-loop on
    the != condition); the corpus side stays put."""
    p = plans("sim_cosine_topk")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_pass_stats_agg_partial_aggregation(plans):
    """TPC-H Q1 shape: map-side partial HashAggregate before the single
    exchange (two HashAggregate levels around one Exchange)."""
    p = plans("pass_stats_agg")
    assert p.count("HashAggregate") >= 2
    assert "PushedFilters:" in p and "LessThanOrEqual(l_shipdate" in p


def test_unresolved_refs_anti_join_broadcast(plans):
    p = plans("unresolved_refs")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_jaccard_capped_skew_safe_df_cap(plans):
    """r7: the df-cap is a combinable count + semi-join back — NEVER a
    count window partitioned by the content key (a boilerplate shingle
    with 10^8 postings would sort on one task; the single-reducer class
    the r6 verdict flagged). No window keyed by a fingerprint, no
    cartesian anywhere; the semi-join is present."""
    p = plans("dd_jaccard_capped")
    assert "Window" not in p
    assert "CartesianProduct" not in p
    # the capped index is materialized once (lineage-truncating
    # checkpoint) ahead of its consumers, so the final plan reads the
    # in-memory index instead of re-running the shingle kernel 3x
    assert "ExistingRDD" in p


def test_eog_order_edges_one_shuffle(plans):
    """Window-lag EOG emission: exactly one exchange (the window
    partitioning) above the scan."""
    p = plans("eog_order_edges")
    assert p.count("- Exchange (") == 1  # tree occurrences, excl. BroadcastExchange
    assert "Window" in p


def test_link_scored_no_shuffle_for_scoring(plans):
    """Candidate scoring is pure Column math — the only exchanges are
    the planted explode's input and the two window picks; no join at
    all in the scoring path."""
    p = plans("link_scored")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
