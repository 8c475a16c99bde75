"""Connected-components tests (TypeResolver/Tarjan analog) — fixture
shapes per FIXTURES.md §5 plus a randomized cross-check against a pure
python union-find."""

import random

from cpg_spark.operators.canonicalize import canonical_map, connected_components


def _cc_py(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u, v in edges:
        union(u, v)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["member_id"]: r["component_id"]
        for r in connected_components(df).collect()
    }
    exp = _cc_py(edges)
    # python CC uses path compression; normalize to min-of-component
    comp = {}
    for n, r in exp.items():
        comp.setdefault(r, []).append(n)
    exp_min = {n: min(m) for r, m in comp.items() for n in m}
    assert got == exp_min


def test_chain(spark):
    _run(spark, [("a", "b"), ("b", "c"), ("c", "d")])


def test_star(spark):
    _run(spark, [("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("hub", "s4")])


def test_two_components_and_selfloop(spark):
    _run(spark, [("a", "b"), ("x", "y"), ("y", "z"), ("a", "a")])


def test_skewed_component(spark):
    edges = [("hot", f"m{i}") for i in range(50)] + [("m0", "m49")]
    _run(spark, edges)


def test_long_path_converges_logarithmically(spark):
    """24-node path: O(log n) large/small-star rounds must converge well
    under the iteration cap (scale property, not just correctness)."""
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(23)]
    _run(spark, edges)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = [f"v{i:02d}" for i in range(40)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(35)]
    _run(spark, edges)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert connected_components(df).count() == 0


def test_canonical_map_matches_golden(spark, alias_df, corpus):
    got = {
        r["member_id"]: r["component_id"] for r in canonical_map(alias_df).collect()
    }
    exp = {r["member_id"]: r["component_id"] for r in corpus["expected_components"]}
    assert got == exp
