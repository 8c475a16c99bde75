"""QueryTree evidence-carrying boolean algebra (reference
query/QueryTree.kt:162-296): values, evaluated reprs, and full-depth
JSON child provenance; grouped ∀/∃ witness collection."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cpg_spark import querytree as qt


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(
        [(1, 5, 3), (2, 2, 7), (3, 4, 4)], "id long, a long, b long"
    ).cache()


def _one(df, col="q"):
    return df.collect()[0][col]


def test_comparison_leaf_reprs(spark, pairs):
    rows = pairs.select("id", qt.qt_gt(F.col("a"), F.col("b")).alias("q")).collect()
    by_id = {r["id"]: r["q"] for r in rows}
    assert by_id[1]["value"] is True and by_id[1]["repr"] == "5 > 3 = true"
    assert by_id[2]["value"] is False and by_id[2]["repr"] == "2 > 7 = false"
    assert by_id[1]["op"] == "gt" and list(by_id[1]["children"]) == []


def test_and_or_carry_children(spark, pairs):
    g = qt.qt_gt(F.col("a"), F.col("b"))
    le = qt.qt_le(F.col("a"), F.lit(10))
    rows = pairs.select("id", qt.qt_and(g, le).alias("q")).collect()
    q1 = {r["id"]: r["q"] for r in rows}[1]
    assert q1["value"] is True and q1["op"] == "and"
    kids = [json.loads(c) for c in q1["children"]]
    assert [k["op"] for k in kids] == ["gt", "le"]
    assert kids[0]["repr"] == "5 > 3 = true"


def test_nested_provenance_full_depth(spark, pairs):
    """A tree of trees: the JSON children of the root contain the
    grandchildren — provenance survives arbitrary nesting."""
    inner = qt.qt_and(qt.qt_gt(F.col("a"), F.lit(0)), qt.qt_gt(F.col("b"), F.lit(0)))
    root = qt.qt_or(inner, qt.qt_eq(F.col("a"), F.col("b")))
    q = _one(pairs.filter("id = 1").select(root.alias("q")))
    assert q["value"] is True
    inner_json = json.loads(q["children"][0])
    assert inner_json["op"] == "and"
    grandkids = [json.loads(c) for c in inner_json["children"]]
    assert [g["op"] for g in grandkids] == ["gt", "gt"]


def test_implies_lazy_children(spark, pairs):
    """Reference QueryTree.kt:196-204: a false antecedent keeps only
    itself as evidence — the consequent is not part of the explanation."""
    ant = qt.qt_gt(F.col("a"), F.col("b"))
    con = qt.qt_gt(F.col("a"), F.lit(0))
    rows = pairs.select("id", qt.qt_implies(ant, con).alias("q")).collect()
    by_id = {r["id"]: r["q"] for r in rows}
    assert by_id[2]["value"] is True         # false => X is true
    assert len(by_id[2]["children"]) == 1    # only the antecedent
    assert by_id[1]["value"] is True
    assert len(by_id[1]["children"]) == 2


def test_forall_collects_failing_witnesses(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 60), (1, 70), (2, 5)], "grp long, x long"
    )
    out = qt.qt_forall(df, ["grp"], qt.qt_lt(F.col("x"), F.lit(50)))
    by_grp = {r["grp"]: r for r in out.collect()}
    assert by_grp[1]["qt"]["value"] is False and by_grp[1]["n_failing"] == 2
    wits = [json.loads(c) for c in by_grp[1]["qt"]["children"]]
    assert sorted(w["repr"] for w in wits) == ["60 < 50 = false", "70 < 50 = false"]
    assert by_grp[2]["qt"]["value"] is True and by_grp[2]["qt"]["children"] == []


def test_exists_collects_satisfying_witnesses(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 60), (2, 5)], "grp long, x long"
    )
    out = qt.qt_exists(df, ["grp"], qt.qt_ge(F.col("x"), F.lit(50)))
    by_grp = {r["grp"]: r for r in out.collect()}
    assert by_grp[1]["qt"]["value"] is True and by_grp[1]["n_satisfying"] == 1
    assert json.loads(by_grp[1]["qt"]["children"][0])["repr"] == "60 >= 50 = true"
    assert by_grp[2]["qt"]["value"] is False


def test_witness_cap_is_visible(spark):
    """The witness list caps at max_witnesses but n_failing reports the
    true count — capping is never silent."""
    df = spark.createDataFrame([(1, 100 + i) for i in range(9)], "grp long, x long")
    out = qt.qt_forall(df, ["grp"], qt.qt_lt(F.col("x"), F.lit(50)), max_witnesses=3)
    r = out.collect()[0]
    assert r["n_failing"] == 9 and len(r["qt"]["children"]) == 3
