"""Configurable DFA typestate evaluator (DFAOrderEvaluator analog)."""

from __future__ import annotations

from cpg_spark.operators.typestate import dfa_evaluate


def _dfa(spark, rows):
    return spark.createDataFrame(
        rows, "src_state string, symbol string, dst_state string"
    )


def _events(spark, rows):
    return spark.createDataFrame(rows, "k string, t int, sym string")


def test_dfa_accepting_and_violating(spark):
    """open -> use* -> close protocol: u before o is a missing
    transition (violation frozen at S0 with its index); terminating
    after open without close is non-accepting but NOT a violation."""
    dfa = _dfa(
        spark,
        [("S0", "o", "OPEN"), ("OPEN", "u", "OPEN"), ("OPEN", "c", "S0")],
    )
    ev = _events(
        spark,
        [
            ("good", 0, "o"), ("good", 1, "u"), ("good", 2, "c"),
            ("early_use", 0, "u"), ("early_use", 1, "o"),
            ("no_close", 0, "o"), ("no_close", 1, "u"),
        ],
    )
    out = {
        r["k"]: r
        for r in dfa_evaluate(
            ev, dfa, ["k"], ["t"], "sym", "S0", ("S0",)
        ).collect()
    }
    assert out["good"]["ok"] and out["good"]["final_state"] == "S0"
    assert out["good"]["violation_idx"] == -1
    # missing transition at position 0: frozen state, index recorded
    assert not out["early_use"]["ok"]
    assert out["early_use"]["final_state"] == "S0"
    assert out["early_use"]["violation_idx"] == 0
    # clean walk, non-accepting termination
    assert not out["no_close"]["ok"]
    assert out["no_close"]["final_state"] == "OPEN"
    assert out["no_close"]["violation_idx"] == -1


def test_dfa_violation_freezes_walk(spark):
    """Symbols after the violating one are ignored (the reference stops
    interpreting the base after a missing transition)."""
    dfa = _dfa(spark, [("S0", "a", "S1"), ("S1", "b", "S2")])
    ev = _events(
        spark, [("x", 0, "a"), ("x", 1, "z"), ("x", 2, "b")]
    )
    row = dfa_evaluate(ev, dfa, ["k"], ["t"], "sym", "S0", ("S2",)).collect()[0]
    assert row["violation_idx"] == 1
    assert row["final_state"] == "S1"  # frozen where it got stuck
    assert not row["ok"]


def test_dfa_cap_truncates_with_flag(spark):
    """max_events pre-truncates per key via window rank — bounded
    per-group state — and reports it, never silently."""
    dfa = _dfa(spark, [("S0", "a", "S0")])
    ev = _events(spark, [("k1", i, "a") for i in range(10)])
    row = dfa_evaluate(
        ev, dfa, ["k"], ["t"], "sym", "S0", ("S0",), max_events=3
    ).collect()[0]
    assert row["n_events"] == 10
    assert row["truncated"] is True
    assert row["ok"]


def test_dfa_order_is_by_order_cols(spark):
    """Sequence order comes from order_cols, not input row order."""
    dfa = _dfa(spark, [("S0", "a", "S1"), ("S1", "b", "S2")])
    ev = _events(spark, [("k", 1, "b"), ("k", 0, "a")])  # shuffled input
    row = dfa_evaluate(ev, dfa, ["k"], ["t"], "sym", "S0", ("S2",)).collect()[0]
    assert row["ok"] and row["final_state"] == "S2"


def _branched_inputs(spark):
    """open/use/close protocol over a branched EOG per base object:

        n0(o) --> n1(u) --> n3(c)     clean path: o u c   -> accept
        n0(o) --> n2(c) --> n3(c)     bad path:   o c c   -> second c
                                       has no transition from S0 (viol)
    """
    nodes = spark.createDataFrame(
        [
            ("x", 0, "o"), ("x", 1, "u"), ("x", 2, "c"), ("x", 3, "c"),
            # second object: purely linear, non-accepting terminal
            ("y", 0, "o"), ("y", 1, "u"),
        ],
        "k string, node long, symbol string",
    )
    edges = spark.createDataFrame(
        [("x", 0, 1), ("x", 0, 2), ("x", 1, 3), ("x", 2, 3), ("y", 0, 1)],
        "k string, src long, dst long",
    )
    dfa = spark.createDataFrame(
        [("S0", "o", "OPEN"), ("OPEN", "u", "OPEN"), ("OPEN", "c", "S0")],
        "src_state string, symbol string, dst_state string",
    )
    return nodes, edges, dfa


def test_dfa_branched_per_path_verdicts(spark):
    """The DFAOrderEvaluator branch case (DFAOrderEvaluator.kt:72-520):
    one branch of the same base object accepts while the other violates
    — a single-total-order fold cannot see this."""
    from cpg_spark.operators.typestate import dfa_evaluate_branched

    nodes, edges, dfa = _branched_inputs(spark)
    rows = {
        (r["k"], r["path"]): r
        for r in dfa_evaluate_branched(
            nodes, edges, dfa, "k", "S0", ("S0",)
        ).collect()
    }
    assert set(rows) == {("x", "0>1>3"), ("x", "0>2>3"), ("y", "0>1")}
    good = rows[("x", "0>1>3")]
    assert good["ok"] and good["final_state"] == "S0"
    assert good["violation_idx"] == -1
    bad = rows[("x", "0>2>3")]
    # o c -> back to S0; second c has no transition from S0: viol at 2,
    # state frozen at S0 but the path is NOT ok
    assert not bad["ok"] and bad["violation_idx"] == 2
    assert bad["final_state"] == "S0"
    # y terminates in OPEN: no violation, just non-accepting
    ynn = rows[("y", "0>1")]
    assert not ynn["ok"] and ynn["violation_idx"] == -1
    assert ynn["final_state"] == "OPEN"
    assert not any(r["truncated"] for r in rows.values())


def test_dfa_branched_honors_unreachable(spark):
    """A dead branch (UnreachableEOGPass flag) contributes no paths —
    the ControlFlowSensitiveDFGPass.kt:211-213 consumption rule."""
    from pyspark.sql import functions as F

    from cpg_spark.operators.typestate import dfa_evaluate_branched

    nodes, edges, dfa = _branched_inputs(spark)
    edges = edges.withColumn(
        "unreachable",
        (F.col("k") == "x") & (F.col("src") == 0) & (F.col("dst") == 2),
    )
    rows = dfa_evaluate_branched(
        nodes, edges, dfa, "k", "S0", ("S0",)
    ).collect()
    paths = {(r["k"], r["path"]) for r in rows}
    # the violating branch is dead; node 2 becomes an entry (no incoming
    # live edge), spawning its own c->c path — entries are structural
    assert ("x", "0>2>3") not in paths
    assert ("x", "0>1>3") in paths and ("x", "2>3") in paths


def test_dfa_branched_depth_cap_flags_truncation(spark):
    """A cycle never terminates: its walks hit max_depth, are dropped,
    and the key's surviving rows carry truncated=True (capped-witness
    pattern — never silent)."""
    from cpg_spark.operators.typestate import dfa_evaluate_branched

    nodes = spark.createDataFrame(
        [("c", 0, "e"), ("c", 1, "e"), ("c", 2, "e")],
        "k string, node long, symbol string",
    )
    # 0 -> 1 <-> 2 cycle plus a terminal escape 1 -> 2 ... make 0->1,
    # 1->2, 2->1 (cycle) and 1->3? keep simple: 0->1,1->2,2->1
    edges = spark.createDataFrame(
        [("c", 0, 1), ("c", 1, 2), ("c", 2, 1)],
        "k string, src long, dst long",
    )
    dfa = spark.createDataFrame(
        [("S0", "e", "S0")], "src_state string, symbol string, dst_state string"
    )
    rows = dfa_evaluate_branched(
        nodes, edges, dfa, "k", "S0", ("S0",), max_depth=8
    ).collect()
    # no terminal exists: zero path rows — acceptable; truncation is
    # visible via a bounded probe with a terminal attached
    nodes2 = nodes.union(
        spark.createDataFrame([("c", 3, "e")], "k string, node long, symbol string")
    )
    edges2 = edges.union(
        spark.createDataFrame([("c", 2, 3)], "k string, src long, dst long")
    )
    rows2 = dfa_evaluate_branched(
        nodes2, edges2, dfa, "k", "S0", ("S0",), max_depth=6
    ).collect()
    assert rows2 and all(r["truncated"] for r in rows2)
    assert rows == [] or all(r["truncated"] for r in rows)


def test_dfa_branched_cyclic_eog_never_silent(spark):
    """Cyclic EOGs — the `while` back-edge shape the reference worklist
    enters from the function head — must produce visible output:
    a cycle with an exit edge walks from a synthetic smallest-node
    entry (bounded unrolling, rows flagged truncated); a pure cycle
    with no terminal emits one diagnostic row; a dangling edge endpoint
    (no nodes row) is skipped with the group flagged, not KeyError'd."""
    from cpg_spark.operators.typestate import dfa_evaluate_branched

    nodes = spark.createDataFrame(
        [
            # w: while-shape — 0<->1 cycle with exit 1->2
            ("w", 0, "o"), ("w", 1, "u"), ("w", 2, "c"),
            # p: pure 2-cycle, no terminal anywhere
            ("p", 0, "o"), ("p", 1, "u"),
            # d: linear but edge 1->5 points at a node with no row
            ("d", 0, "o"), ("d", 1, "u"),
        ],
        "k string, node long, symbol string",
    )
    edges = spark.createDataFrame(
        [
            ("w", 0, 1), ("w", 1, 0), ("w", 1, 2),
            ("p", 0, 1), ("p", 1, 0),
            ("d", 0, 1), ("d", 1, 5),
        ],
        "k string, src long, dst long",
    )
    dfa = spark.createDataFrame(
        [("S0", "o", "OPEN"), ("OPEN", "u", "OPEN"), ("OPEN", "c", "S0")],
        "src_state string, symbol string, dst_state string",
    )
    out = dfa_evaluate_branched(
        nodes, edges, dfa, "k", "S0", ("S0",), max_depth=6
    ).collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r["k"], []).append(r)
    # w: two unrollings terminate at the exit before the depth cap
    w_paths = {r["path"] for r in by_k["w"]}
    assert w_paths == {"0>1>2", "0>1>0>1>2"}
    assert all(r["truncated"] for r in by_k["w"])
    ok_first = next(r for r in by_k["w"] if r["path"] == "0>1>2")
    assert ok_first["ok"] and ok_first["final_state"] == "S0"
    # p: no verdict possible -> exactly one diagnostic row
    assert len(by_k["p"]) == 1
    diag = by_k["p"][0]
    assert diag["path"] is None and diag["n_nodes"] == 0 and diag["truncated"]
    assert not diag["ok"]
    # d: the dangling successor is skipped; the walk ends at node 1
    assert {r["path"] for r in by_k["d"]} == {"0>1"}
    assert all(r["truncated"] for r in by_k["d"])


def test_dfa_branched_randomized_differential(spark):
    """Randomized differential check: dfa_evaluate_branched vs an
    independent recursive enumerator over random forward-edge DAGs with
    random symbols and a random partial DFA (seeded — deterministic)."""
    import random

    from cpg_spark.operators.typestate import dfa_evaluate_branched

    rng = random.Random(20260817)
    symbols = ["a", "b", "c"]
    states = ["S0", "S1", "S2"]
    node_rows, edge_rows, keys = [], [], []
    for g in range(12):
        k = f"g{g}"
        keys.append(k)
        n = rng.randint(1, 7)
        syms = {i: rng.choice(symbols) for i in range(n)}
        for i, s in syms.items():
            node_rows.append((k, i, s))
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < 0.4:
                    edge_rows.append((k, i, j))
    # partial DFA: ~60% of (state, sym) pairs defined
    trans = {}
    for s in states:
        for a in symbols:
            if rng.random() < 0.6:
                trans[(s, a)] = rng.choice(states)
    accept = {"S1"}

    def reference(k):
        """Independent recursive enumeration (different structure from
        the operator's iterative DFS)."""
        syms = {i: s for kk, i, s in node_rows if kk == k}
        adj = {}
        has_in = set()
        for kk, a, b in edge_rows:
            if kk == k:
                adj.setdefault(a, set()).add(b)
                has_in.add(b)
        out = {}

        def walk(node, state, viol, path):
            nxt_state, nxt_viol = state, viol
            if viol < 0:
                t = trans.get((state, syms[node]))
                if t is None:
                    nxt_viol = len(path)
                else:
                    nxt_state = t
            path = path + [node]
            succs = adj.get(node, set())
            if not succs:
                out[">".join(map(str, path))] = (
                    len(path), nxt_state,
                    nxt_viol < 0 and nxt_state in accept, nxt_viol,
                )
                return
            for s in sorted(succs):
                walk(s, nxt_state, nxt_viol, path)

        for entry in sorted(i for i in syms if i not in has_in):
            walk(entry, "S0", -1, [])
        return out

    nodes = spark.createDataFrame(node_rows, "k string, node long, symbol string")
    edges = spark.createDataFrame(edge_rows, "k string, src long, dst long")
    dfa = spark.createDataFrame(
        [(s, a, t) for (s, a), t in trans.items()],
        "src_state string, symbol string, dst_state string",
    )
    got: dict = {}
    for r in dfa_evaluate_branched(
        nodes, edges, dfa, "k", "S0", tuple(accept)
    ).collect():
        got.setdefault(r["k"], {})[r["path"]] = (
            r["n_nodes"], r["final_state"], r["ok"], r["violation_idx"]
        )
    for k in keys:
        assert got.get(k, {}) == reference(k), k
