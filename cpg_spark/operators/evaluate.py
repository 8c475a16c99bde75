"""Data-level constant folding over an expression DAG — the
ValueEvaluator analog (reference cpg-analysis/.../ValueEvaluator.kt
walks DFG/initializer edges backward from a node and folds literals
through operators; MultiValueEvaluator collects the value SET when
multiple paths reach a node).

Catalyst folds constants inside one expression tree for free; this
operator folds constants ACROSS graph rows — literals flow over edges
into operator nodes until a fixpoint, the data-level propagation the
reference performs on its object graph.

Tables:
  nodes(node_id long, kind string, value double, op string)
        kind: 'lit' (value set) | 'op' (op set: add|mul|min|max|neg)
  edges(child long, parent long)                   child feeds parent

Each round evaluates every op node whose inputs are ALL evaluated
(bottom-up level at a time — rounds = DAG depth, each round one join +
one map-side-combinable aggregation). Nodes on cycles or fed by
unresolvable inputs stay unevaluated, exactly like the reference's
"cannot evaluate" result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_expressions(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 32
) -> DataFrame:
    """Returns (node_id, value) for every node whose value folds to a
    constant; unevaluable nodes are absent."""
    vals = (
        nodes.filter(F.col("kind") == "lit")
        .select("node_id", F.col("value").cast("double").alias("value"))
        .localCheckpoint(eager=True)
    )
    ops = nodes.filter(F.col("kind") == "op").select("node_id", "op")
    arity = edges.groupBy(F.col("parent").alias("node_id")).agg(
        F.count(F.lit(1)).alias("__n_args")
    )
    pending = ops.join(arity, "node_id").localCheckpoint(eager=True)

    for _ in range(max_rounds):
        if pending.isEmpty():
            break
        ready = (
            edges.join(vals.withColumnRenamed("node_id", "child"), "child")
            .groupBy(F.col("parent").alias("node_id"))
            .agg(
                F.count(F.lit(1)).alias("__n_ready"),
                F.sum("value").alias("__sum"),
                F.min("value").alias("__min"),
                F.max("value").alias("__max"),
                # product as a fold over the collected args (tiny arity)
                F.aggregate(
                    F.collect_list("value"), F.lit(1.0), lambda acc, x: acc * x
                ).alias("__prod"),
            )
        )
        solved = (
            pending.join(ready, "node_id")
            .filter(F.col("__n_ready") == F.col("__n_args"))
            .select(
                "node_id",
                F.when(F.col("op") == "add", F.col("__sum"))
                .when(F.col("op") == "mul", F.col("__prod"))
                .when(F.col("op") == "min", F.col("__min"))
                .when(F.col("op") == "max", F.col("__max"))
                .when(F.col("op") == "neg", -F.col("__sum"))
                .alias("value"),
            )
            .localCheckpoint(eager=True)
        )
        if solved.isEmpty():
            break
        vals = vals.unionByName(solved).localCheckpoint(eager=True)
        pending = pending.join(solved.select("node_id"), "node_id", "left_anti")
        pending = pending.localCheckpoint(eager=True)
    return vals
