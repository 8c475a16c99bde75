"""Golden tests for the text-analysis operators (hand-computed expected
values, per the reference's exact-assertion style)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.functions.hashing import char_poly_hash_py
from cpg_spark.operators import textstats

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
