"""Salted-aggregation / salted-join equivalence tests (north_rule skew
handling): the salted version must be result-identical to the plain one."""

from pyspark.sql import functions as F

from cpg_spark.operators.skew import salted_collect_set, salted_count, salted_join


def _events(spark):
    # zipfian-ish: key 'hot' dominates
    rows = [("hot", f"u{i % 7}") for i in range(200)] + [
        (f"k{i % 5}", f"u{i % 11}") for i in range(100)
    ]
    return spark.createDataFrame(rows, "key string, val string")


def test_salted_count_equals_plain(spark):
    df = _events(spark)
    plain = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["key"]: r["n"] for r in salted_count(df, ["key"]).collect()}
    assert salted == plain


def test_salted_collect_set_equals_plain(spark):
    df = _events(spark)
    plain = {
        r["key"]: set(r["s"])
        for r in df.groupBy("key").agg(F.collect_set("val").alias("s")).collect()
    }
    salted = {
        r["key"]: set(r["s"])
        for r in salted_collect_set(df, ["key"], "val", "s").collect()
    }
    assert salted == plain


def test_salted_collect_set_cap(spark):
    df = _events(spark)
    out = salted_collect_set(df, ["key"], "val", "s", max_items=3).collect()
    assert all(len(r["s"]) <= 3 for r in out)


def test_salted_join_equals_plain(spark):
    big = _events(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k1", 3)], "key string, dim int"
    )
    plain = sorted(tuple(r) for r in big.join(small, "key").collect())
    salted = sorted(tuple(r) for r in salted_join(big, small, "key").collect())
    assert salted == plain
