"""End-to-end tests for the string-approximation chain (the fork's
EndToEndStringPropertyTest.kt:54-90 analog: synthesize the pattern, then
assert concrete accept/reject behavior) and the grouped-map EOG twin."""

from __future__ import annotations

import re

import pytest

from cpg_spark.operators import canonicalize, extract, stringapprox


def test_charset_approx_accepts_all_members():
    words = ["Acme Corp", "Acme", "Acme Corporation"]
    rx = re.compile(stringapprox.charset_approx_py(words))
    for w in words:
        assert rx.fullmatch(w), w
    # over-approximation: accepts things outside the language too
    assert rx.fullmatch("Acme Acme")
    # but not characters outside the charset / length band
    assert not rx.fullmatch("Zebra!")
    assert not rx.fullmatch("A")


def test_trie_regex_exact_language():
    words = ["Acme Corp", "Acme", "Acme Corporation", "Nordwind"]
    rx = re.compile(stringapprox.trie_regex_py(words))
    for w in words:
        assert rx.fullmatch(w), w
    for bad in ["Acme Cor", "Acme Corporatio", "Nord", "Acme Corps", ""]:
        assert not rx.fullmatch(bad), bad


def test_entity_surface_patterns_end_to_end(spark, alias_df):
    canon = canonicalize.canonical_map(alias_df)
    pats = stringapprox.entity_surface_patterns(alias_df, canon)
    rows = pats.collect()
    assert len(rows) > 0

    members = {
        r["component_id"]: r["aliases"]
        for r in alias_df.join(
            canon.withColumnRenamed("member_id", "entity_id"), "entity_id"
        )
        .groupBy("component_id")
        .agg(__import__("pyspark").sql.functions.collect_set("alias").alias("aliases"))
        .collect()
    }
    for r in rows:
        cs = re.compile(r["charset_regex"])
        ex = re.compile(r["exact_regex"])
        words = sorted(set(members[r["component_id"]]))
        assert r["n_aliases"] == len(words)
        for w in words:
            assert cs.fullmatch(w), (r["component_id"], w, r["charset_regex"])
            assert ex.fullmatch(w), (r["component_id"], w, r["exact_regex"])
    # exact regexes are discriminative: an alias of one multi-alias
    # component must not match another component's exact regex unless
    # it is genuinely shared (aliases here are component-disjoint)
    by_comp = {r["component_id"]: re.compile(r["exact_regex"]) for r in rows}
    for comp, words in members.items():
        for other, rx in by_comp.items():
            if other == comp:
                continue
            others = set(members[other])
            for w in words:
                if w not in others:
                    assert not rx.fullmatch(w), (comp, other, w)


def test_eog_pandas_twin_equals_window(spark, pages_df):
    sent = extract.sentences(pages_df)
    a = {tuple(r) for r in extract.sentence_order_edges(sent).collect()}
    b = {tuple(r) for r in extract.sentence_order_edges_pandas(sent).collect()}
    assert a == b
    assert len(a) > 0
