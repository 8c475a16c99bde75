"""Reaching-definitions worklist (ControlFlowSensitiveDFGPass analog):
per-function fixpoint over the CFG in a cogrouped pandas map; skips
unreachable edges."""

from __future__ import annotations

from cpg_spark.operators.dataflow import reaching_definitions


def _run(spark, edges, defs, edge_schema="func_id long, src_block long, dst_block long"):
    e = spark.createDataFrame(edges, edge_schema)
    d = spark.createDataFrame(defs, "func_id long, block_id long, var string, def_id long")
    return {
        (r["func_id"], r["block_id"], r["var"], r["def_id"])
        for r in reaching_definitions(e, d).collect()
    }


def test_loop_fixpoint(spark):
    """Diamond-with-loop: b0(x=d0) -> b1 <-> b2(x=d2), b1 -> b3. Both
    defs reach b1/b2/b3 entries once the back edge feeds the loop head."""
    edges = [(7, 0, 1), (7, 1, 2), (7, 2, 1), (7, 1, 3)]
    defs = [(7, 0, "x", 100), (7, 2, "x", 200)]
    got = _run(spark, edges, defs)
    assert got == {
        (7, 1, "x", 100), (7, 1, "x", 200),
        (7, 2, "x", 100), (7, 2, "x", 200),
        (7, 3, "x", 100), (7, 3, "x", 200),
    }


def test_kill_shadows_upstream_def(spark):
    """A redefining block kills the upstream def on the path through it:
    b0(x=d0) -> b1(x=d1) -> b2, plus bypass b0 -> b2: b2 sees BOTH (kill
    is path-sensitive through the merge)."""
    edges = [(1, 0, 1), (1, 1, 2), (1, 0, 2)]
    defs = [(1, 0, "x", 10), (1, 1, "x", 11)]
    got = _run(spark, edges, defs)
    assert (1, 2, "x", 10) in got and (1, 2, "x", 11) in got
    assert (1, 1, "x", 10) in got
    # b1's OWN def never reaches its entry
    assert (1, 1, "x", 11) not in got


def test_unreachable_back_edge_skipped(spark):
    """The ControlFlowSensitiveDFGPass.kt:211-213 consumption: a dead
    back edge means the loop-body def never reaches the loop head."""
    schema = "func_id long, src_block long, dst_block long, unreachable boolean"
    edges = [(7, 0, 1, False), (7, 1, 2, False), (7, 2, 1, True), (7, 1, 3, False)]
    defs = [(7, 0, "x", 100), (7, 2, "x", 200)]
    got = _run(spark, edges, defs, schema)
    assert got == {
        (7, 1, "x", 100), (7, 2, "x", 100), (7, 3, "x", 100),
    }


def test_functions_isolated(spark):
    """Two functions solve independently inside one job (the per-group
    parallelism contract)."""
    edges = [(1, 0, 1), (2, 0, 1)]
    defs = [(1, 0, "x", 10), (2, 0, "y", 20)]
    got = _run(spark, edges, defs)
    assert got == {(1, 1, "x", 10), (2, 1, "y", 20)}
