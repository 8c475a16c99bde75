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
        kind: 'lit' (value set) | 'op'
  edges(child long, parent long[, pos int])        child feeds parent

Operator coverage mirrors ValueEvaluator.kt:119-141 (binary + - * /),
268-330 (comparisons > < >= <= ==, unary -, conditionals):
  order-insensitive (no pos needed): add, mul, min, max, neg
  ordered (edges must carry pos):    sub (0-1), div (0/1),
                                     gt/lt/ge/le/eq (0 vs 1),
                                     cond (pos0 ? pos1 : pos2)
Comparisons fold to 1.0 / 0.0 (one value column; the reference returns
Boolean). Division by zero folds to NO value — the node stays
unevaluated, the reference's "cannot evaluate" rule (ValueEvaluator.kt
handleDiv returns cannotEvaluate on zero divisor).

Each round evaluates every op node whose inputs are ALL evaluated
(bottom-up level at a time — rounds = DAG depth, each round one join +
one map-side-combinable aggregation). Nodes on cycles or fed by
unresolvable inputs stay unevaluated. Iterations truncate lineage via
the shared reliable-checkpoint switch (iterutil.ckpt): local in tests,
checkpoint_dir on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterutil import ckpt as _ckpt


def _with_pos(edges: DataFrame) -> DataFrame:
    if "pos" in edges.columns:
        return edges
    return edges.withColumn("pos", F.lit(None).cast("int"))


def evaluate_expression_sets(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 32,
    max_set_size: int = 32,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """MultiValueEvaluator analog (reference analysis/
    MultiValueEvaluator.kt:43-60 — when several paths define a value, the
    result is the SET of possibilities, a ConcreteNumberSet, with bounded
    exploration): every node evaluates to a sorted array of possible
    values.

    nodes(node_id, kind, value, op): kind 'lit' (value) | 'op'
    (op: 'phi' — union of any number of inputs — 'neg' unary, binary
    'add'/'mul'/'sub'/'div'/'gt'/'lt'/'ge'/'le'/'eq' pairwise over the
    two input sets, or 'cond' — the union of BOTH branch sets at pos
    1/2, the reference's ConditionalExpression rule which explores both
    branches). edges(child, parent, pos). Pairwise division drops
    zero-divisor pairs (each is the reference's cannotEvaluate); a node
    whose set ends up empty stays unevaluated. Set sizes cap at
    max_set_size (sorted, smallest kept) and the `truncated` flag
    reports it — bounded like the reference, never silent. Returns
    (node_id, vals array<double>, truncated)."""
    edges = _with_pos(edges)
    vals = _ckpt(
        nodes.filter(F.col("kind") == "lit")
        .select(
            "node_id",
            F.array(F.col("value").cast("double")).alias("vals"),
            F.lit(False).alias("truncated"),
        ),
        checkpoint_dir,
    )
    ops = nodes.filter(F.col("kind") == "op").select("node_id", "op")
    arity = edges.groupBy(F.col("parent").alias("node_id")).agg(
        F.count(F.lit(1)).alias("__n_args")
    )
    pending = _ckpt(ops.join(arity, "node_id"), checkpoint_dir)

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
            F.flatten(
                F.collect_list(F.when(F.col("pos") >= 1, F.col("vals")))
            ).alias("__branches"),
            F.max(F.col("truncated").cast("int")).alias("__trunc_in"),
        )

        def pairwise(f):
            return F.flatten(
                F.transform(
                    F.col("__a"), lambda x: F.transform(F.col("__b"), lambda y: f(x, y))
                )
            )

        bool_d = lambda c: c.cast("double")  # noqa: E731
        raw = (
            F.when(F.col("op") == "phi", F.col("__all"))
            .when(F.col("op") == "add", pairwise(lambda x, y: x + y))
            .when(F.col("op") == "mul", pairwise(lambda x, y: x * y))
            .when(F.col("op") == "sub", pairwise(lambda x, y: x - y))
            .when(
                F.col("op") == "div",
                F.filter(
                    pairwise(lambda x, y: F.when(y != 0, x / y)),
                    lambda v: v.isNotNull(),
                ),
            )
            .when(F.col("op") == "gt", pairwise(lambda x, y: bool_d(x > y)))
            .when(F.col("op") == "lt", pairwise(lambda x, y: bool_d(x < y)))
            .when(F.col("op") == "ge", pairwise(lambda x, y: bool_d(x >= y)))
            .when(F.col("op") == "le", pairwise(lambda x, y: bool_d(x <= y)))
            .when(F.col("op") == "eq", pairwise(lambda x, y: bool_d(x == y)))
            .when(
                F.col("op") == "neg",
                F.transform(F.col("__all"), lambda x: F.lit(0.0) - x),
            )
            # both branches possible, like the reference's
            # ConditionalExpression handling in MultiValueEvaluator
            .when(F.col("op") == "cond", F.col("__branches"))
        )
        solved = _ckpt(
            pending.join(ready, "node_id")
            .filter(F.col("__n_ready") == F.col("__n_args"))
            .select(
                "node_id",
                F.sort_array(F.array_distinct(raw)).alias("__set"),
                F.col("__trunc_in"),
            )
            .filter(F.col("__set").isNotNull() & (F.size("__set") > 0))
            .select(
                "node_id",
                F.slice(F.col("__set"), 1, max_set_size).alias("vals"),
                (
                    (F.size("__set") > max_set_size)
                    | (F.col("__trunc_in") == 1)
                ).alias("truncated"),
            ),
            checkpoint_dir,
        )
        if solved.isEmpty():
            break
        vals = _ckpt(vals.unionByName(solved), checkpoint_dir)
        pending = _ckpt(
            pending.join(solved.select("node_id"), "node_id", "left_anti"),
            checkpoint_dir,
        )
    return vals


def evaluate_expressions(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 32,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Returns (node_id, value) for every node whose value folds to a
    constant; unevaluable nodes (cycles, unknown ops, division by zero)
    are absent — the reference's cannotEvaluate result."""
    edges = _with_pos(edges)
    vals = _ckpt(
        nodes.filter(F.col("kind") == "lit")
        .select("node_id", F.col("value").cast("double").alias("value")),
        checkpoint_dir,
    )
    ops = nodes.filter(F.col("kind") == "op").select("node_id", "op")
    arity = edges.groupBy(F.col("parent").alias("node_id")).agg(
        F.count(F.lit(1)).alias("__n_args")
    )
    pending = _ckpt(ops.join(arity, "node_id"), checkpoint_dir)

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
                # positional args for ordered operators
                F.min(F.when(F.col("pos") == 0, F.col("value"))).alias("__a"),
                F.min(F.when(F.col("pos") == 1, F.col("value"))).alias("__b"),
                F.min(F.when(F.col("pos") == 2, F.col("value"))).alias("__c"),
            )
        )
        a, b, c = F.col("__a"), F.col("__b"), F.col("__c")
        bool_d = lambda cc: cc.cast("double")  # noqa: E731
        solved = _ckpt(
            pending.join(ready, "node_id")
            .filter(F.col("__n_ready") == F.col("__n_args"))
            .select(
                "node_id",
                F.when(F.col("op") == "add", F.col("__sum"))
                .when(F.col("op") == "mul", F.col("__prod"))
                .when(F.col("op") == "min", F.col("__min"))
                .when(F.col("op") == "max", F.col("__max"))
                # 0.0 - x, not -x: IEEE negation of 0.0 is -0.0, which
                # stringifies differently across engines
                .when(F.col("op") == "neg", F.lit(0.0) - F.col("__sum"))
                .when(F.col("op") == "sub", a - b)
                # zero divisor -> NULL -> filtered -> cannotEvaluate
                .when(F.col("op") == "div", F.when(b != 0, a / b))
                .when(F.col("op") == "gt", bool_d(a > b))
                .when(F.col("op") == "lt", bool_d(a < b))
                .when(F.col("op") == "ge", bool_d(a >= b))
                .when(F.col("op") == "le", bool_d(a <= b))
                .when(F.col("op") == "eq", bool_d(a == b))
                # pos0 ? pos1 : pos2 (the reference folds conditionals
                # whose condition folds to a constant)
                .when(F.col("op") == "cond", F.when(a != 0, b).otherwise(c))
                .alias("value"),
            )
            .filter(F.col("value").isNotNull()),
            checkpoint_dir,
        )
        if solved.isEmpty():
            break
        vals = _ckpt(vals.unionByName(solved), checkpoint_dir)
        pending = _ckpt(
            pending.join(solved.select("node_id"), "node_id", "left_anti"),
            checkpoint_dir,
        )
    return vals
