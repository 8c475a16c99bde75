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


# --- regular approximation (Mohri-Nederhof) ----------------------------------

import re as _re

from cpg_spark.functions.grammar import (
    BOTH,
    Grammar,
    N,
    T,
    grammar_to_regex,
    recursion_kind,
    regular_approximation,
    sccs,
)
from cpg_spark.operators.stringapprox import grammar_patterns


def _full(rx, s):
    return _re.fullmatch(rx, s) is not None


def test_regular_grammar_stays_exact():
    """Already strongly regular grammars pass through untouched
    (RegularApproximation.kt early return) and synthesize their exact
    language: X -> a X | b  =>  a*b."""
    g = Grammar()
    x = g.add_nt("X")
    g.add_prod(x, ((T, "a"), (N, x)))
    g.add_prod(x, ((T, "b"),))
    assert not regular_approximation(g, {x})
    rx = grammar_to_regex(g, x)
    assert _full(rx, "b") and _full(rx, "aaab")
    assert not _full(rx, "a") and not _full(rx, "ba")


def test_left_linear_exact():
    g = Grammar()
    x = g.add_nt("X")
    g.add_prod(x, ((N, x), (T, "a")))
    g.add_prod(x, ((T, "b"),))
    assert not regular_approximation(g, {x})
    rx = grammar_to_regex(g, x)
    assert _full(rx, "b") and _full(rx, "baa") and not _full(rx, "ab")


def test_mohri_nederhof_anbn():
    """The canonical non-regular grammar aⁿbⁿ (binarized S -> a T | ε,
    T -> S b) is BOTH-recursive; MN rewriting must produce exactly a*b*:
    a sound superset (every aⁿbⁿ accepted) that is regular
    (RegularApproximation.kt:45-174 case table)."""
    g = Grammar()
    s = g.add_nt("S")
    tn = g.add_nt("T")
    g.add_prod(s, ((T, "a"), (N, tn)))
    g.add_prod(s, ())
    g.add_prod(tn, ((N, s), (T, "b")))
    assert recursion_kind(g, {s, tn}) == BOTH
    assert regular_approximation(g, {s})
    assert all(recursion_kind(g, set(c)) != BOTH for c in sccs(g))
    rx = grammar_to_regex(g, s)
    for n in range(6):
        assert _full(rx, "a" * n + "b" * n)      # soundness
    assert _full(rx, "aab") and _full(rx, "abb")  # over-approximation
    for bad in ["ba", "aba", "bab", "abab"]:
        assert not _full(rx, bad)


def test_mohri_nederhof_nested_parens():
    """Tricky.java analog (EndToEndStringPropertyTest.kt:128-146): nested
    parentheses E -> ( E ) | 1. The MN regex accepts all balanced members
    AND unbalanced prefixes (the thesis' own assertions accept
    '((((1*12)*3)*123)'), while rejecting strings outside \\(*1\\)*."""
    g = Grammar()
    e = g.add_nt("E")
    m = g.add_nt("M")
    g.add_prod(e, ((T, "("), (N, m)))
    g.add_prod(m, ((N, e), (T, ")")))
    g.add_prod(e, ((T, "1"),))
    assert regular_approximation(g, {e})
    rx = grammar_to_regex(g, e)
    for good in ["1", "(1)", "((1))", "((1"]:
        assert _full(rx, good), good
    for bad in ["", ")(", "()", "(1))("]:
        assert not _full(rx, bad), bad


def test_grammar_patterns_operator(spark):
    """End-to-end grouped-map operator: two hotspots — one cyclic (needs
    MN), one finite (exact) — synthesized in one Spark job."""
    rows = [
        # hotspot "cyc": S -> a T | eps ; T -> S b
        ("cyc", 0, 0, "t", "a", "n", "1"),
        ("cyc", 0, 1, None, None, None, None),
        ("cyc", 1, 0, "n", "0", "t", "b"),
        # hotspot "fin": S -> x A ; A -> y | z
        ("fin", 0, 0, "t", "x", "n", "1"),
        ("fin", 1, 0, "t", "y", None, None),
        ("fin", 1, 1, "t", "z", None, None),
    ]
    prods = spark.createDataFrame(
        rows,
        "hotspot_id string, nt long, prod_idx int, "
        "s1_kind string, s1 string, s2_kind string, s2 string",
    )
    got = {r["hotspot_id"]: r for r in grammar_patterns(prods).collect()}
    assert got["cyc"]["was_approximated"] is True
    assert got["fin"]["was_approximated"] is False
    cyc_rx, fin_rx = got["cyc"]["regex"], got["fin"]["regex"]
    assert _full(cyc_rx, "aabb") and _full(cyc_rx, "aab") and not _full(cyc_rx, "ba")
    assert _full(fin_rx, "xy") and _full(fin_rx, "xz") and not _full(fin_rx, "x")
