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


def test_normalize_url_schemeless_passthrough(spark):
    """Scheme-less / malformed URLs (open-web reality) pass through
    unchanged instead of being mis-parsed into '://<path-as-host>...'
    identities."""
    cases = [
        "example.com/x?utm_source=1",
        "//proto-relative.example.com/y",
        "not a url at all",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [
        r["n"]
        for r in df.select(
            urlcurate.normalize_url(F.col("url")).alias("n")
        ).collect()
    ]
    assert got == cases


def test_domain_cap_mega_domain_shed_identical_kept_set(spark):
    """The shed path (salted pre-count + per-salt top-cap pre-filter)
    on a planted mega-domain: the kept set and the kept rows' exact
    ranks are IDENTICAL to the unshed exact window; shed rows come
    back with dom_rank NULL / kept False; no row is lost; and the
    mega-domain's exact window ran on at most n_salts*cap candidate
    rows instead of the whole domain."""
    rows = [(i, f"https://mega.example.com/page/{i}?k={i}") for i in range(400)]
    rows += [(1000 + i, f"https://tiny{i}.example.org/p") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kw = dict(cap=5, shed_factor=4, n_salts=8)  # threshold 20 << 400
    exact = urlcurate.domain_cap(df, shed=False, **kw).collect()
    shed = urlcurate.domain_cap(df, shed=True, **kw).collect()
    assert len(shed) == len(exact) == len(rows)
    kept_exact = {r["doc_id"] for r in exact if r["kept"]}
    kept_shed = {r["doc_id"] for r in shed if r["kept"]}
    assert kept_shed == kept_exact
    rank_exact = {r["doc_id"]: r["dom_rank"] for r in exact if r["kept"]}
    rank_shed = {r["doc_id"]: r["dom_rank"] for r in shed if r["kept"]}
    assert rank_shed == rank_exact
    # the tiny domains are under threshold: fully exact rows either way
    tiny_exact = sorted(
        (r["doc_id"], r["dom_rank"], r["kept"]) for r in exact if r["doc_id"] >= 1000
    )
    tiny_shed = sorted(
        (r["doc_id"], r["dom_rank"], r["kept"]) for r in shed if r["doc_id"] >= 1000
    )
    assert tiny_shed == tiny_exact
    # mega-domain overflow: shed rows are NULL-ranked and not kept, and
    # at most n_salts*cap mega rows survived to the exact window
    mega_shed = [r for r in shed if r["doc_id"] < 1000]
    surviving = [r for r in mega_shed if r["dom_rank"] is not None]
    assert len(surviving) <= 8 * 5
    for r in mega_shed:
        if r["dom_rank"] is None:
            assert not r["kept"]
        elif r["dom_rank"] > 5:
            assert not r["kept"]
