"""QueryTree: evidence-carrying boolean algebra as struct columns — the
analog of the reference's query DSL (cpg-analysis query/QueryTree.kt:
162-296), where every boolean result remembers HOW it was derived
(operator, human-readable representation, child subtrees).

Spark-first mapping (SURVEY §2.6): a QueryTree node is a struct column

    struct<value: boolean, op: string, repr: string,
           children: array<string>>

`repr` is the evaluated string representation ("5 > 3 = true", mirroring
QueryTree.stringRepresentation); `children` carries each child subtree as
its JSON rendering (to_json), so provenance is FULL DEPTH while the
column schema stays fixed — the trick that makes an arbitrarily nested
tree representable in a static Spark schema.

∀ / ∃ (reference Query.kt all()/exists()) become grouped aggregations:
value = bool_and / bool_or over element trees, children = the (sorted,
capped) witness subtrees — failing elements for ∀, satisfying ones for ∃
— exactly the reference's "which elements made this false" evidence.

Everything is Column expressions (codegen'd); only the witness
collect_list shuffles, and it is capped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QT_TYPE = "struct<value:boolean,op:string,repr:string,children:array<string>>"


def _node(value: Column, op: str, repr_col: Column, children: Column) -> Column:
    return F.struct(
        value.alias("value"),
        F.lit(op).alias("op"),
        repr_col.alias("repr"),
        children.alias("children"),
    )


def _no_children() -> Column:
    return F.array().cast("array<string>")


def qt_const(value: Column, label: Column | str | None = None) -> Column:
    """Leaf node: a boolean with its own description (QueryTree.kt:67
    single-value constructor)."""
    v = value.cast("boolean")
    if label is None:
        rep = v.cast("string")
    elif isinstance(label, str):
        rep = F.concat(F.lit(label + " = "), v.cast("string"))
    else:
        rep = F.concat(label, F.lit(" = "), v.cast("string"))
    return _node(v, "const", rep, _no_children())


def _cmp(op_name: str, sym: str, a: Column, b: Column) -> Column:
    ops = {
        "gt": a > b, "ge": a >= b, "lt": a < b, "le": a <= b, "eq": a == b,
        "ne": a != b,
    }
    v = ops[op_name]
    rep = F.concat(
        a.cast("string"), F.lit(f" {sym} "), b.cast("string"),
        F.lit(" = "), v.cast("string"),
    )
    return _node(v, op_name, rep, _no_children())


def qt_gt(a: Column, b: Column) -> Column:
    return _cmp("gt", ">", a, b)


def qt_ge(a: Column, b: Column) -> Column:
    return _cmp("ge", ">=", a, b)


def qt_lt(a: Column, b: Column) -> Column:
    return _cmp("lt", "<", a, b)


def qt_le(a: Column, b: Column) -> Column:
    return _cmp("le", "<=", a, b)


def qt_eq(a: Column, b: Column) -> Column:
    return _cmp("eq", "==", a, b)


def _binary(op: str, sym: str, value: Column, a: Column, b: Column) -> Column:
    rep = F.concat(
        a["value"].cast("string"), F.lit(f" {sym} "), b["value"].cast("string"),
        F.lit(" = "), value.cast("string"),
    )
    children = F.array(F.to_json(a), F.to_json(b))
    return _node(value, op, rep, children)


def qt_and(a: Column, b: Column) -> Column:
    return _binary("and", "&&", a["value"] & b["value"], a, b)


def qt_or(a: Column, b: Column) -> Column:
    return _binary("or", "||", a["value"] | b["value"], a, b)


def qt_xor(a: Column, b: Column) -> Column:
    return _binary("xor", "xor", a["value"] != b["value"], a, b)


def qt_implies(a: Column, b: Column) -> Column:
    """Logical implication. Mirrors the reference's lazy variant
    (QueryTree.kt:196-204): when the antecedent is false the consequent
    is not evidence — children carry only the antecedent."""
    value = ~a["value"] | b["value"]
    rep = F.concat(
        a["value"].cast("string"), F.lit(" => "), b["value"].cast("string"),
        F.lit(" = "), value.cast("string"),
    )
    children = F.when(
        ~a["value"], F.array(F.to_json(a))
    ).otherwise(F.array(F.to_json(a), F.to_json(b)))
    return _node(value, "implies", rep, children)


def qt_not(a: Column) -> Column:
    value = ~a["value"]
    rep = F.concat(F.lit("! "), a["value"].cast("string"), F.lit(" = "), value.cast("string"))
    return _node(value, "not", rep, F.array(F.to_json(a)))


def qt_forall(
    df: DataFrame,
    group_cols: list[str],
    elem_qt: Column,
    max_witnesses: int = 5,
) -> DataFrame:
    """∀ over each group: value = every element tree true; children = the
    FAILING element subtrees (the reference's all() keeps the subtrees
    that falsify the claim, Query.kt). Witnesses are sorted for
    determinism and capped (no unbounded collect at web scale — the cap
    is visible in n_failing, never silent)."""
    elem = elem_qt
    failing = F.when(~elem["value"], F.to_json(elem))
    agg = df.groupBy(*group_cols).agg(
        F.min(elem["value"]).alias("value"),
        F.count(F.when(~elem["value"], F.lit(1))).alias("n_failing"),
        F.slice(
            F.sort_array(F.collect_list(failing)), 1, max_witnesses
        ).alias("children"),
    )
    return agg.select(
        *group_cols,
        F.struct(
            F.col("value"),
            F.lit("forall").alias("op"),
            F.concat(
                F.lit("forall: "), F.col("n_failing").cast("string"),
                F.lit(" failing = "), F.col("value").cast("string"),
            ).alias("repr"),
            F.col("children"),
        ).alias("qt"),
        "n_failing",
    )


def qt_exists(
    df: DataFrame,
    group_cols: list[str],
    elem_qt: Column,
    max_witnesses: int = 5,
) -> DataFrame:
    """∃ over each group: value = some element tree true; children = the
    SATISFYING subtrees (the evidence that makes it true)."""
    elem = elem_qt
    sat = F.when(elem["value"], F.to_json(elem))
    agg = df.groupBy(*group_cols).agg(
        F.max(elem["value"]).alias("value"),
        F.count(F.when(elem["value"], F.lit(1))).alias("n_satisfying"),
        F.slice(
            F.sort_array(F.collect_list(sat)), 1, max_witnesses
        ).alias("children"),
    )
    return agg.select(
        *group_cols,
        F.struct(
            F.col("value"),
            F.lit("exists").alias("op"),
            F.concat(
                F.lit("exists: "), F.col("n_satisfying").cast("string"),
                F.lit(" satisfying = "), F.col("value").cast("string"),
            ).alias("repr"),
            F.col("children"),
        ).alias("qt"),
        "n_satisfying",
    )
