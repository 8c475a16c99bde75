"""Golden tests for the text-analysis operators (hand-computed expected
values, per the reference's exact-assertion style)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.functions.hashing import char_poly_hash_py
from cpg_spark.operators import textstats


def test_gopher_quality_hand_computed(spark):
    """Gopher repetition signals on hand-checkable docs: 'x y x y x y'
    -> n=6, mean len 1, frac_top_word 3/6, top 2-gram ('x','y') covers
    3 occurrences x 2 chars of 6 total chars = 1.0, no duplicate
    5-gram; 60 distinct 6-char tokens pass every gate; the repetitive
    doc fails (n<50, mean_word_len<3, top-2-gram 1.0); an empty doc is
    unscorable and fails, never silently passes."""
    clean = " ".join(f"tok{i:03d}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, "x y x y x y"), (1, clean), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.gopher_quality(docs).collect()}
    r0 = out[0]
    assert r0["n_tokens"] == 6 and r0["mean_word_len"] == 1.0
    assert r0["frac_top_word"] == 0.5
    assert r0["top_2gram_frac"] == 1.0  # 3 x 2 chars / 6 chars
    assert r0["dup_5gram_char_frac"] == 0.0
    assert not r0["gopher_pass"]
    r1 = out[1]
    assert r1["n_tokens"] == 60 and r1["mean_word_len"] == 6.0
    assert abs(r1["frac_top_word"] - 1 / 60) < 1e-15
    assert abs(r1["top_2gram_frac"] - 12 / 360) < 1e-15
    assert r1["dup_5gram_char_frac"] == 0.0 and r1["gopher_pass"]
    r2 = out[2]
    assert r2["n_tokens"] == 0 and r2["mean_word_len"] is None
    assert not r2["gopher_pass"]

DOCS = [
    (0, "the cat and the dog", "en"),
    (1, "der hund und die katze ist von hier", "de"),
    (2, "xyz qrs", "zz"),
    (3, "a a a a", "en"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string").cache()


def test_token_stats_exact(docs_df):
    got = {r["doc_id"]: r for r in textstats.token_stats(docs_df).collect()}
    assert got[0]["n_tokens"] == 5
    assert got[0]["n_distinct"] == 4
    assert got[0]["ttr"] == 0.8
    assert got[0]["mean_tok_len"] == 3.0  # (3+3+3+3+3)/5
    assert got[3]["n_distinct"] == 1


def test_lang_id_picks_stopword_majority(docs_df):
    got = {r["doc_id"]: r for r in textstats.lang_id(docs_df).collect()}
    assert got[0]["pred_lang"] == "en"
    assert got[1]["pred_lang"] == "de"
    assert got[2]["pred_lang"] == "und"  # no stopword hit at all
    assert got[0]["score_en"] == 3  # the, and, the


def test_fingerprint_matches_python_twin(docs_df):
    got = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(docs_df).collect()}
    for doc_id, text, _lang in DOCS:
        assert got[doc_id] == char_poly_hash_py(text)  # already normalized
    assert len(set(got.values())) == len(DOCS)


def test_quality_score_bounds(docs_df):
    rows = textstats.quality_score(docs_df).collect()
    for r in rows:
        assert 0.0 <= r["quality"] <= 1.0
