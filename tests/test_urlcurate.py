"""URL normalization + per-domain cap (operators/urlcurate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpg_spark.functions.hashing import char_poly_hash_py
from cpg_spark.operators import urlcurate


def test_normalize_url_rules(spark):
    """Each published rule on a hand-built URL zoo: case-folded scheme
    and host (path case preserved), default port stripped (non-default
    kept), fragment dropped, tracking params dropped, surviving params
    sorted, empty query dropped entirely."""
    cases = [
        (
            "HTTPS://WWW.Example.COM:443/Art/One?utm_source=x&b=2&a=1#frag",
            "https://www.example.com/Art/One?a=1&b=2",
        ),
        ("http://example.com:80/?gclid=123", "http://example.com/"),
        ("http://example.com:8080/p", "http://example.com:8080/p"),
        ("https://sub.example.com/path?ref=tw&x=1", "https://sub.example.com/path?x=1"),
        ("https://a.net/q?fbclid=9", "https://a.net/q"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["n"]
        for r in df.select(
            urlcurate.normalize_url(F.col("url")).alias("n")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_domain_cap_deterministic(spark):
    """Cap selection is the content-hash order (ties to smaller id):
    replicated independently with the python hash twin; the domain
    groups ports-and-www variants of one host together."""
    urls = [
        (i, f"https://WWW.d{i % 2}.com:443/p{i}?utm_x=1&k={i}") for i in range(8)
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    out = {r["doc_id"]: r for r in urlcurate.domain_cap(df, cap=2).collect()}
    assert {out[i]["domain"] for i in range(8)} == {"d0.com", "d1.com"}
    for dom in ("d0.com", "d1.com"):
        ids = [i for i in range(8) if out[i]["domain"] == dom]
        order = sorted(ids, key=lambda i: (char_poly_hash_py(out[i]["url_norm"]), i))
        for rank, i in enumerate(order, start=1):
            assert out[i]["dom_rank"] == rank
            assert out[i]["kept"] == (rank <= 2)
    assert sum(1 for r in out.values() if r["kept"]) == 4
