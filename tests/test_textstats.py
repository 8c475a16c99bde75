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


def test_gopher_repetition_hand_computed(spark):
    """The full Table A1 repetition battery on hand-checkable docs.
    d1: 'the cat sat on the mat' twice + one unique line — dup_line
    1/3 lines, 17/48 chars; the duplicated 5-grams cover token
    positions 1..12 exactly (union, no double count) = 34/48 chars.
    d3 'spam' x 12: every position covered by every family = 1.0
    everywhere, all repetition gates fail. d5: paragraph duplicate.
    Token-less doc: NULL signals, pass=false."""
    docs = spark.createDataFrame(
        [
            ("d1", "the cat sat on the mat\nthe cat sat on the mat\nunique line here"),
            ("d2", " ".join(f"tok{i:03d}" for i in range(60))),
            ("d3", "spam " * 12),
            ("d4", ""),
            ("d5", "p one here\n\np one here\n\np two now"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in textstats.gopher_repetition(docs).collect()}

    r1 = out["d1"]
    assert abs(r1["dup_line_frac"] - 1 / 3) < 1e-15
    # line chars INCLUDE intra-line spaces: 22 + 22 + 16; one repeated
    # occurrence of the 22-char line
    assert abs(r1["dup_line_char_frac"] - 22 / 60) < 1e-15
    assert abs(r1["dup_5gram_char_frac"] - 34 / 48) < 1e-15
    assert abs(r1["dup_6gram_char_frac"] - 34 / 48) < 1e-15
    assert r1["dup_7gram_char_frac"] == 0.0
    assert not r1["repetition_pass"]

    r2 = out["d2"]  # 60 distinct tokens: no duplicates anywhere,
    # top n-gram coverage = n tokens' chars / total
    assert r2["dup_line_frac"] == 0.0
    assert abs(r2["top_2gram_frac"] - 12 / 360) < 1e-15
    assert abs(r2["top_3gram_frac"] - 18 / 360) < 1e-15
    assert abs(r2["top_4gram_frac"] - 24 / 360) < 1e-15
    assert all(r2[f"dup_{n}gram_char_frac"] == 0.0 for n in range(5, 11))
    assert r2["repetition_pass"]

    r3 = out["d3"]
    for n in (2, 3, 4):
        assert r3[f"top_{n}gram_frac"] == 1.0
    for n in range(5, 11):
        assert r3[f"dup_{n}gram_char_frac"] == 1.0
    assert not r3["repetition_pass"]

    r4 = out["d4"]
    assert r4["dup_line_frac"] is None and not r4["repetition_pass"]

    r5 = out["d5"]
    assert abs(r5["dup_para_frac"] - 1 / 3) < 1e-15
    assert abs(r5["dup_line_frac"] - 1 / 3) < 1e-15
    assert not r5["repetition_pass"]  # top-gram gates fail on tiny docs


def test_massivetext_gates_verdict(spark):
    """The combined verdict: a 60-distinct-token doc passes shape AND
    repetition; frac_top_word is reported but NOT a gate (a doc with
    one word at 25% frequency still passes — the r5 ADVICE finding);
    short docs fail shape, repetitive docs fail repetition."""
    clean = " ".join(f"tok{i:03d}" for i in range(60))
    # 'the' appears 20/80 times = 0.25 > the old custom 0.2 gate, but
    # every Table A1 gate passes (dup 5-grams need repeated runs; the
    # 'the' occurrences are isolated between distinct fillers)
    topword = " ".join(f"the word{i:04d} also{i:04d} more{i:04d}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, clean), (1, "tiny doc"), (2, ("spam " * 60)), (3, topword)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.massivetext_gates(docs).collect()}
    assert out[0]["gopher_pass"] and out[0]["repetition_pass"]
    assert out[1]["n_tokens"] == 2 and not out[1]["gopher_pass"]
    assert not out[2]["gopher_pass"] and not out[2]["repetition_pass"]
    r3 = out[3]
    assert r3["frac_top_word"] == 0.25
    assert r3["repetition_pass"] and r3["gopher_pass"]


def test_c4_fineweb_gates_hand_computed(spark):
    """Every C4 line rule, every page rule, and both FineWeb ratios on
    hand-built multi-line docs (the driver corpus is single-line, so
    this test carries the line-machinery coverage)."""
    good_line = "this is a perfectly normal sentence with many words."
    docs = [
        # doc 1: clean 3-sentence page, all lines survive
        (1, "\n".join([good_line] * 3)),
        # doc 2: line filters — no terminal punct / <5 words /
        # javascript line all dropped; page then has <3 sentences
        (2, "\n".join([
            good_line,
            "no terminal punctuation here at all",
            "too few words.",
            "please enable javascript to view this content.",
            good_line,
        ])),
        # doc 3: lorem ipsum page kill (lines themselves fine)
        (3, "\n".join([good_line] * 3) + "\nlorem ipsum dolor sit amet."),
        # doc 4: curly brace page kill
        (4, "\n".join([good_line] * 3) + "\nfunction f() { return 1; }"),
        # doc 5: bad-word page kill (stub list)
        (5, "\n".join([good_line] * 3) + "\nsome obscene words here."),
        # doc 6: FineWeb kill — mostly short unpunctuated nav lines
        (6, "\n".join(["home", "about", "contact us", "products",
                       "news", "login", good_line])),
        # doc 7: empty
        (7, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in textstats.c4_fineweb_gates(df).collect()}

    assert got[1]["n_lines"] == 3 and got[1]["n_kept_lines"] == 3
    assert got[1]["n_sentences"] == 3
    assert got[1]["c4_pass"] and got[1]["fineweb_pass"]
    assert got[1]["text_clean"] == "\n".join([good_line] * 3)

    assert got[2]["n_lines"] == 5 and got[2]["n_kept_lines"] == 2
    assert not got[2]["c4_pass"]  # 2 sentences < 3
    # ratios count ALL lines (the javascript rule only drops the line
    # from text_clean): 4 of 5 end in '.', short lines = 1
    assert got[2]["frac_punct_lines"] == 4 / 5
    assert got[2]["frac_short_lines"] == 1 / 5

    for d in (3, 4, 5):
        assert got[d]["n_kept_lines"] >= 3 and not got[d]["c4_pass"], d
    assert got[3]["fineweb_pass"]  # page kills are C4-only

    assert not got[6]["fineweb_pass"]  # 6/7 short, 1/7 punct
    assert got[6]["frac_punct_lines"] == 1 / 7
    assert not got[6]["c4_pass"]

    assert got[7]["n_lines"] == 0 and not got[7]["c4_pass"]
    assert not got[7]["fineweb_pass"]
    assert got[7]["frac_punct_lines"] is None  # unscorable, not 0
