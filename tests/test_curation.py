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


def test_curation_pipeline_stages_and_resume(spark, docs_df, tmp_path):
    """CurationPipeline commits one snapshot per stage with lineage
    rows; a rerun with the same input token skips every committed stage
    and returns identical kept rows; killing after `candidates` resumes
    from there. Matches curate()'s answer on the same corpus."""
    from cpg_spark.lineage import read_lineage
    from cpg_spark.plans.curation import CURATION_STAGES, CurationPipeline, curate

    wh = str(tmp_path / "wh")
    kw = dict(target_langs=("en",), min_quality=0.3, near_dup_jaccard=0.5)

    # partial run, as if killed after the candidate stage
    p0 = CurationPipeline(spark, wh, run_id="c0", **kw)
    p0.run(docs_df, input_token="t1", stop_after="candidates")
    assert p0.ran == ["gate", "candidates"]

    # full run resumes: the two committed stages are skipped
    p1 = CurationPipeline(spark, wh, run_id="c1", **kw)
    out = p1.run(docs_df, input_token="t1")
    assert p1.skipped == ["gate", "candidates"]
    assert set(p1.ran) == {"verified_edges", "dup_map", "kept"}
    kept = sorted(r["doc_id"] for r in out["kept"].collect())

    # identical to the lazy composition's answer
    lazy = curate(docs_df, **kw)
    assert kept == sorted(r["doc_id"] for r in lazy["kept"].collect())
    lazy["unpersist"]()

    # second full rerun: everything skipped, same rows
    p2 = CurationPipeline(spark, wh, run_id="c2", **kw)
    out2 = p2.run(docs_df, input_token="t1")
    assert p2.skipped == list(CURATION_STAGES) and p2.ran == []
    assert kept == sorted(r["doc_id"] for r in out2["kept"].collect())

    # lineage: at least one row per executed stage
    lin = {r["stage"] for r in read_lineage(spark, wh).collect()}
    assert set(CURATION_STAGES) <= lin

    # param change invalidates: new fingerprints, stages rerun
    p3 = CurationPipeline(
        spark, wh, run_id="c3", target_langs=("en",), min_quality=0.3,
        near_dup_jaccard=0.99,
    )
    p3.run(docs_df, input_token="t1", stop_after="gate")
    # the param token is part of EVERY stage fingerprint, so even the
    # gate recomputes under changed params instead of serving a
    # snapshot built for different settings
    assert p3.ran == ["gate"]
