"""Randomized differential test for the ValueEvaluator analog: 50
seeded random expression DAGs evaluated by an independent pure-python
topological interpreter, all shipped as ONE Spark job (node ids
namespaced per case) and compared result-for-result — including which
nodes must be ABSENT (division by zero / unreachable ops)."""

from __future__ import annotations

import random

from cpg_spark.operators.evaluate import evaluate_expressions

BIN_OPS = ["add", "mul", "sub", "div", "gt", "lt", "ge", "le", "eq", "min", "max"]


def _interp(op: str, args: list[float]) -> float | None:
    a = args[0]
    b = args[1] if len(args) > 1 else None
    if op == "add":
        return sum(args)
    if op == "mul":
        out = 1.0
        for x in args:
            out *= x
        return out
    if op == "min":
        return min(args)
    if op == "max":
        return max(args)
    if op == "neg":
        return 0.0 - sum(args)
    if op == "sub":
        return a - b
    if op == "div":
        return None if b == 0 else a / b
    if op == "gt":
        return float(a > b)
    if op == "lt":
        return float(a < b)
    if op == "ge":
        return float(a >= b)
    if op == "le":
        return float(a <= b)
    if op == "eq":
        return float(a == b)
    if op == "cond":
        return args[1] if args[0] != 0 else args[2]
    raise AssertionError(op)


def _gen_case(rng: random.Random, base: int):
    """One random DAG: 3-5 literals, 2-6 ops wired to earlier nodes."""
    nodes, edges, values = [], [], {}
    n_lit = rng.randint(3, 5)
    ids = []
    for i in range(n_lit):
        nid = base + i
        val = float(rng.randint(-3, 3))
        nodes.append((nid, "lit", val, None))
        values[nid] = val
        ids.append(nid)
    n_ops = rng.randint(2, 6)
    for j in range(n_ops):
        nid = base + 10 + j
        if rng.random() < 0.2:
            op, arity = "neg", 1
        elif rng.random() < 0.3:
            op, arity = "cond", 3
        else:
            op, arity = rng.choice(BIN_OPS), 2
        srcs = [rng.choice(ids) for _ in range(arity)]
        nodes.append((nid, "op", None, op))
        for pos, s in enumerate(srcs):
            edges.append((s, nid, pos))
        args = [values.get(s) for s in srcs]
        values[nid] = None if any(a is None for a in args) else _interp(op, args)
        ids.append(nid)
    return nodes, edges, values


def test_random_dags_match_python_interpreter(spark):
    rng = random.Random(20260817)
    all_nodes, all_edges, expected = [], [], {}
    for case in range(50):
        n, e, v = _gen_case(rng, case * 1000)
        all_nodes += n
        all_edges += e
        expected.update(v)
    nodes = spark.createDataFrame(
        all_nodes, "node_id long, kind string, value double, op string"
    )
    edges = spark.createDataFrame(all_edges, "child long, parent long, pos int")
    got = {
        r["node_id"]: r["value"]
        for r in evaluate_expressions(nodes, edges).collect()
    }
    for nid, v in expected.items():
        if v is None:
            assert nid not in got, (nid, got.get(nid))
        else:
            assert got.get(nid) == v, (nid, got.get(nid), v)
    assert len(got) == sum(1 for v in expected.values() if v is not None)
