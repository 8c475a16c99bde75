"""URL-level web curation: canonical URL normalization and per-domain
frequency caps — the two steps every Common-Crawl-scale pipeline runs
before any text-level work (the same page arrives under dozens of URL
spellings; a handful of domains would otherwise dominate the corpus).

The reference analog is FilenameMapper / the per-file identity the
frontends key everything on (one canonical name per translation unit);
here the canonical name is the normalized URL and the corpus-balance
knob is the domain cap.

Everything is pure Column expressions (regexp + array ops inside
whole-stage codegen) with DuckDB-oracle twins in cpg_spark/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import char_poly_hash_col

# query params that never identify content (tracking/click ids) — the
# public-list prefixes every curation pipeline strips
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "ref=")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase scheme and host, default port stripped
    (:80 for http, :443 for https), fragment dropped, tracking params
    (TRACKING_PREFIXES) dropped, surviving query params SORTED so
    param order never splits a page's identity. Path case and
    non-default ports are preserved (they are content-significant).
    Pure map — one row in, one string out, no Python."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    nofrag = F.regexp_replace(
        F.regexp_replace(url, _SCHEME_RE, ""), r"#.*", ""
    )
    hostport = F.lower(F.regexp_extract(nofrag, r"^([^/?]+)", 1))
    host = (
        F.when(
            scheme == F.lit("http"), F.regexp_replace(hostport, r":80$", "")
        )
        .when(
            scheme == F.lit("https"), F.regexp_replace(hostport, r":443$", "")
        )
        .otherwise(hostport)
    )
    rest = F.regexp_replace(nofrag, r"^[^/?]+", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    def _is_tracking(p: Column) -> Column:
        out = F.lit(False)
        for pre in TRACKING_PREFIXES:
            out = out | p.startswith(pre)
        return out

    keep = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~_is_tracking(p),
    )
    qs = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_domain(url_norm: Column) -> Column:
    """Grouping domain of a normalized URL: host minus any port and a
    leading 'www.' (the registered-domain approximation that needs no
    public-suffix list; swap in a PSL join for exact eTLD+1)."""
    host = F.regexp_extract(url_norm, r"^[a-z][a-z0-9+.-]*://([^/?]+)", 1)
    return F.regexp_replace(
        F.regexp_replace(host, r":[0-9]+$", ""), r"^www\.", ""
    )


def domain_cap(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 10,
) -> DataFrame:
    """Per-domain frequency cap: keep at most `cap` documents per
    domain, chosen by content hash of the normalized URL (ties to the
    smaller id) — deterministic at any parallelism, no RNG. Returns
    every input row with (url_norm, domain, dom_rank, kept): the drop
    decision stays with the caller (accounting, never silent).

    Scale shape: normalization is a scan projection; the rank is one
    shuffle keyed by domain. A mega-domain is exactly the skewed-window
    case — cap selection is NOT re-aggregable as written, so at
    web scale pre-filter with an approximate per-domain count (salted,
    operators/skew.py) to shed the >100·cap overflow before the exact
    window; the window then runs on bounded partitions."""
    from pyspark.sql import Window

    u = normalize_url(F.col(url_col))
    base = docs.select(
        id_col,
        u.alias("url_norm"),
        url_domain(u).alias("domain"),
    ).withColumn("__h", char_poly_hash_col(F.col("url_norm")))
    w = Window.partitionBy("domain").orderBy("__h", id_col)
    return base.select(
        id_col,
        "url_norm",
        "domain",
        F.row_number().over(w).alias("dom_rank"),
    ).withColumn("kept", F.col("dom_rank") <= cap)
