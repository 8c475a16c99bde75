"""End-to-end curation pipeline over a planted corpus: gates drop what
they should, exact+near duplicates collapse to one canonical survivor."""

from __future__ import annotations

import pytest

from cpg_spark.plans.curation import curate

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")
OTHER = (
    "completely different content about spark shuffles partitions and "
    "broadcast joins running on very large clusters every day"
)
DOCS = [
    (0, BASE, "en"),
    (1, BASE, "en"),            # exact dup of 0
    (2, NEAR, "en"),            # near dup of 0
    (3, OTHER, "en"),           # unique keeper
    (4, "der hund und die katze ist von hier und der rest der tiere", "de"),
    (5, "x", "en"),             # too short / low quality
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string").cache()


def test_curate_end_to_end(spark, docs_df):
    out = curate(
        docs_df, target_langs=("en",), min_quality=0.3, near_dup_jaccard=0.5
    )
    kept = sorted(r["doc_id"] for r in out["kept"].collect())
    dropped = {r["doc_id"]: r["drop_reason"] for r in out["dropped"].collect()}

    assert kept == [0, 3]
    assert dropped[1] == "duplicate"
    assert dropped[2] == "duplicate"
    assert dropped[4] == "gate"      # predicted de
    assert dropped[5] == "gate"      # low quality
    # every doc accounted for exactly once
    assert set(kept) | set(dropped) == {d[0] for d in DOCS}
    assert not (set(kept) & set(dropped))

    dup_map = {r["doc_id"]: r["canonical_id"] for r in out["dup_map"].collect()}
    assert dup_map[1] == 0 and dup_map[2] == 0 and dup_map[3] == 3


def test_curate_no_gates_keeps_uniques(spark, docs_df):
    out = curate(docs_df, near_dup_jaccard=0.99)
    kept = sorted(r["doc_id"] for r in out["kept"].collect())
    # only the exact dup collapses at 0.99 (near-dup jaccard < 0.99)
    assert 0 in kept and 2 in kept and 3 in kept
    assert 1 not in kept


def test_curate_unpersist_releases_cache(spark, docs_df):
    """The caller-owned cache handle releases the candidate-pair blocks
    (library sessions must not leak storage across invocations)."""
    out = curate(docs_df, near_dup_jaccard=0.99)
    out["kept"].count()
    out["unpersist"]()
    # idempotent second call must not raise
    out["unpersist"]()
