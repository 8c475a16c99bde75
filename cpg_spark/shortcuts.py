"""Thin query layer over the pipeline's output tables — the analog of
the reference's Extensions.kt shortcut DSL (result.calls/.records/...,
Extensions.kt:457-493) and the cpg-console demo checks
(NullPointerCheck.kt:51, OutOfBoundsCheck.kt:51-69), re-expressed as
DataFrame helpers a notebook user composes.

All helpers are lazy column pipelines — filters and projections reach
the parquet scan (predicate pushdown), nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# -- shortcut filters (kind/label predicates, Extensions.kt:457-493) --------


def by_pred(triples: DataFrame, pred: str) -> DataFrame:
    return triples.filter(F.col("pred") == pred)


def mentions_of(triples: DataFrame, entity_id: str) -> DataFrame:
    """Pages mentioning an entity (REFERS_TO-edge lookup analog)."""
    return by_pred(triples, "mentions").filter(F.col("obj") == entity_id)


def cooccurrents(triples: DataFrame, entity_id: str) -> DataFrame:
    """Entities co-occurring with `entity_id`, with evidence counts —
    the callees/callersOf analog (Extensions.kt:500-512): the edge is
    symmetric but stored once (subj < obj)."""
    co = by_pred(triples, "co_occurs_with")
    fwd = co.filter(F.col("subj") == entity_id).select(
        F.col("obj").alias("entity_id"), "n_evidence"
    )
    bwd = co.filter(F.col("obj") == entity_id).select(
        F.col("subj").alias("entity_id"), "n_evidence"
    )
    return fwd.unionByName(bwd)


def entities_of_type(nodes: DataFrame, entity_type: str) -> DataFrame:
    return nodes.filter(F.col("entity_type") == entity_type)


def inferred_entities(nodes: DataFrame) -> DataFrame:
    """Closed-world completions (inference/Inference.kt analog): entities
    that exist only because something referenced them."""
    return nodes.filter(F.col("is_inferred"))


# -- demo checks (console-check analogs) -------------------------------------


def dangling_references_check(triples: DataFrame, nodes: DataFrame) -> DataFrame:
    """NullPointerCheck analog: co-occurrence edges whose endpoint has no
    node row — a graph-integrity violation (should be empty)."""
    co = by_pred(triples, "co_occurs_with")
    ends = co.select(F.col("subj").alias("id")).union(
        co.select(F.col("obj").alias("id"))
    ).distinct()
    return ends.join(nodes.select("id"), "id", "left_anti")


def overlinked_entities_check(
    nodes: DataFrame, max_pages_ratio: float = 0.5, total_pages: int | None = None
) -> DataFrame:
    """OutOfBoundsCheck analog: entities linked on an implausible share
    of pages (evaluate a quantity against a capacity bound) — the skew /
    bad-dictionary smoke signal."""
    if total_pages is None:
        raise ValueError("pass total_pages (capacity bound)")
    return nodes.filter(F.col("n_pages") > max_pages_ratio * total_pages).select(
        "id", "name", "n_pages", "n_mentions"
    )
