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


def evaluate_expression_sets(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 32,
    max_set_size: int = 32,
) -> DataFrame:
    """MultiValueEvaluator analog (reference analysis/
    MultiValueEvaluator.kt:43-60 — when several paths define a value, the
    result is the SET of possibilities, a ConcreteNumberSet, with bounded
    exploration): every node evaluates to a sorted array of possible
    values.

    nodes(node_id, kind, value, op): kind 'lit' (value) | 'op'
    (op: 'phi' — union of any number of inputs — or binary 'add'/'mul',
    pairwise over the two input sets). edges(child, parent, pos).
    Set sizes cap at max_set_size (sorted, smallest kept) and the
    `truncated` flag reports it — bounded like the reference, never
    silent. Returns (node_id, vals array<double>, truncated)."""
    vals = (
        nodes.filter(F.col("kind") == "lit")
        .select(
            "node_id",
            F.array(F.col("value").cast("double")).alias("vals"),
            F.lit(False).alias("truncated"),
        )
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
        child_vals = edges.join(
            vals.withColumnRenamed("node_id", "child"), "child"
        )
        ready = child_vals.groupBy(F.col("parent").alias("node_id")).agg(
            F.count(F.lit(1)).alias("__n_ready"),
            F.flatten(F.collect_list("vals")).alias("__all"),
            F.first(F.when(F.col("pos") == 0, F.col("vals")), ignorenulls=True).alias("__a"),
            F.first(F.when(F.col("pos") == 1, F.col("vals")), ignorenulls=True).alias("__b"),
            F.max(F.col("truncated").cast("int")).alias("__trunc_in"),
        )
        pairwise_add = F.flatten(
            F.transform(
                F.col("__a"), lambda x: F.transform(F.col("__b"), lambda y: x + y)
            )
        )
        pairwise_mul = F.flatten(
            F.transform(
                F.col("__a"), lambda x: F.transform(F.col("__b"), lambda y: x * y)
            )
        )
        raw = (
            F.when(F.col("op") == "phi", F.col("__all"))
            .when(F.col("op") == "add", pairwise_add)
            .when(F.col("op") == "mul", pairwise_mul)
        )
        solved = (
            pending.join(ready, "node_id")
            .filter(F.col("__n_ready") == F.col("__n_args"))
            .select(
                "node_id",
                F.sort_array(F.array_distinct(raw)).alias("__set"),
                F.col("__trunc_in"),
            )
            .select(
                "node_id",
                F.slice(F.col("__set"), 1, max_set_size).alias("vals"),
                (
                    (F.size("__set") > max_set_size)
                    | (F.col("__trunc_in") == 1)
                ).alias("truncated"),
            )
            .localCheckpoint(eager=True)
        )
        if solved.isEmpty():
            break
        vals = vals.unionByName(solved).localCheckpoint(eager=True)
        pending = pending.join(
            solved.select("node_id"), "node_id", "left_anti"
        ).localCheckpoint(eager=True)
    return vals


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
