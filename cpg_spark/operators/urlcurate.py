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
    # scheme-less / malformed input (open-web reality): the scheme regex
    # matches nothing and the hostport regex would eat the first path
    # segment as host, minting identities like '://foo' — pass such URLs
    # through unchanged instead of mis-canonicalizing them
    return F.when(F.length(scheme) == 0, url).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(
                F.lit("")
            ),
        )
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
    shed_factor: int = 100,
    n_salts: int = 16,
    shed: bool = True,
) -> DataFrame:
    """Per-domain frequency cap: keep at most `cap` documents per
    domain, chosen by content hash of the normalized URL (ties to the
    smaller id) — deterministic at any parallelism, no RNG. Returns
    every input row with (url_norm, domain, dom_rank, kept): the drop
    decision stays with the caller (accounting, never silent).

    Scale shape: normalization is a scan projection; the exact rank is
    one shuffle keyed by domain — the skewed-window case when a
    mega-domain holds 10^8+ pages. The shed path (default on) bounds
    it: a salted two-phase per-domain count (operators/skew.py,
    combinable — no reducer sees a whole hot key) finds domains over
    shed_factor·cap rows; inside those, a per-(domain, salt) window —
    n_salts-way parallel, each partition ~|domain|/n_salts rows —
    keeps only the per-salt top-`cap` as candidates and sheds the
    rest BEFORE the exact window. The kept-set is provably identical:
    any global top-cap row has at most cap-1 rows ahead of it in any
    subset, so per-salt rank ≤ cap; and a shed row has ≥ cap smaller
    rows in its own salt class, so its global rank is > cap
    (pytest-asserted against the unshed path on a planted
    mega-domain). Shed rows return dom_rank=NULL (provably > cap,
    exact value not computed), kept=false; candidate rows beyond the
    cap carry a rank that is exact for ranks ≤ cap and a
    lower-bound > cap otherwise. Domains under the threshold — and
    every row when shed=False — get the fully exact rank."""
    from pyspark.sql import Window

    from .skew import salted_count

    u = normalize_url(F.col(url_col))
    base = docs.select(
        id_col,
        u.alias("url_norm"),
        url_domain(u).alias("domain"),
    ).withColumn("__h", char_poly_hash_col(F.col("url_norm")))
    w = Window.partitionBy("domain").orderBy("__h", id_col)

    def exact(cand: DataFrame) -> DataFrame:
        return cand.select(
            id_col,
            "url_norm",
            "domain",
            F.row_number().over(w).alias("dom_rank"),
        ).withColumn("kept", F.col("dom_rank") <= cap)

    if not shed:
        return exact(base)
    overflow = (
        salted_count(
            # url_norm is the row-distinguishing salt source: a
            # mega-domain's count spreads across all salt classes
            base.select("domain", "url_norm"),
            ["domain"],
            out="__n",
            n_salts=n_salts,
        )
        .filter(F.col("__n") > shed_factor * cap)
        .select("domain", F.lit(True).alias("__over"))
    )
    b = base.join(F.broadcast(overflow), "domain", "left")
    normal = b.filter(F.col("__over").isNull()).drop("__over")
    heavy = b.filter(F.col("__over").isNotNull()).drop("__over")
    w_salt = Window.partitionBy("domain", "__salt").orderBy("__h", id_col)
    ranked = heavy.withColumn(
        "__salt",
        F.pmod(F.xxhash64("url_norm", id_col), F.lit(n_salts)).cast("int"),
    ).withColumn("__sr", F.row_number().over(w_salt))
    survivors = ranked.filter(F.col("__sr") <= cap).drop("__salt", "__sr")
    shed_rows = ranked.filter(F.col("__sr") > cap).select(
        id_col,
        "url_norm",
        "domain",
        F.lit(None).cast("int").alias("dom_rank"),
        F.lit(False).alias("kept"),
    )
    return exact(normal.unionByName(survivors)).unionByName(shed_rows)
