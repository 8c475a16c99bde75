"""Query-layer tests over a real pipeline run (console-check analogs)."""

from __future__ import annotations

import pytest

from cpg_spark import shortcuts
from cpg_spark.operators import canonicalize, extract, link, materialize


@pytest.fixture(scope="module")
def graph(spark, pages_df, alias_df):
    links = link.link_mentions(
        extract.mentions(extract.sentences(pages_df)), alias_df
    )
    comps = canonicalize.canonical_map(alias_df)
    clinks = materialize.canonical_links(links, comps).cache()
    triples = materialize.triples_agg(
        materialize.triples_from_links(clinks, comps)
    ).cache()
    nodes = materialize.nodes_table(clinks).cache()
    return triples, nodes


def test_no_dangling_references(graph):
    triples, nodes = graph
    assert shortcuts.dangling_references_check(triples, nodes).count() == 0


def test_cooccurrents_symmetric_lookup(graph):
    triples, nodes = graph
    some = (
        shortcuts.by_pred(triples, "co_occurs_with")
        .select("subj")
        .first()
    )
    if some:
        got = shortcuts.cooccurrents(triples, some["subj"])
        assert got.count() > 0
        assert set(got.columns) == {"entity_id", "n_evidence"}


def test_overlinked_flags_hot_entity(graph, pages_df):
    _, nodes = graph
    n_pages = pages_df.count()
    # the synthetic hot entity (Acme, >=10% of pages) must trip a 5% bound
    hot = shortcuts.overlinked_entities_check(
        nodes, max_pages_ratio=0.05, total_pages=n_pages
    )
    assert hot.count() >= 1
    # and a sane bound must not flag everything
    calm = shortcuts.overlinked_entities_check(
        nodes, max_pages_ratio=0.9, total_pages=n_pages
    )
    assert calm.count() == 0


def test_inferred_entities_exist(graph):
    _, nodes = graph
    inf = shortcuts.inferred_entities(nodes)
    assert inf.count() > 0  # OOV names in the corpus
    assert all(r["id"].startswith("inf:") for r in inf.collect())
