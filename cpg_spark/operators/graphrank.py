"""Graph centrality over the materialized entity graph: weighted
PageRank as a fixed-iteration DataFrame loop.

The reference stops at graph construction and hands analytics to Neo4j
(cpg Application.kt pushes the graph; centrality would run as a Cypher /
GDS call). A Spark-native KG pipeline wants the first-class ranking
in-engine — it drives entity canonical-name election, crawl
prioritization, and triple-confidence weighting downstream.

Determinism contract (the repo's oracle rule): ranks are IEEE doubles,
so every cross-row sum is a SEQUENTIAL fold over a sort-keyed collected
array — bit-identical at any parallelism and reproducible by the DuckDB
twin. That fold is the ORACLE-PARITY mode; at open-web scale pass
ordered=False to swap each fold for a combinable F.sum (map-side
partials, heavy-hitter-safe) and accept last-ulp nondeterminism in
exchange — the standard trade, documented here rather than silent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ordered_sum(key: str, val: str) -> Column:
    """Sequential left fold of `val` over rows sorted by `key` — the
    engine-parity float sum (see module docstring)."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(key, F.col(val)))),
            lambda s: s.getField(val),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    ordered: bool = True,
    cache_static: bool = True,
    checkpoint_dir: str | None = None,
    truncate_lineage: bool = True,
) -> DataFrame:
    """Weighted PageRank over edges(src, dst[, weight]), fixed n_iter
    power iterations (no data-dependent stopping — same input, same
    output at any parallelism, the kmeans_fit rule).

      r0(v)   = 1/N
      r+1(v)  = (1-d)/N + d * (Σ_{u→v} r(u)·w(u,v)/W_out(u) + D/N)

    with D the dangling mass (rank held by nodes with no out-edge,
    redistributed uniformly — the standard correction, so Σr stays 1).

    Scale shape per iteration: one join of ranks into edges keyed by
    src (both sides hash-partitioned on src — the exchange is reused
    across iterations since the edge side is static), one aggregation
    keyed by dst, one driver-free recombine; the dangling term is a
    1-row aggregate broadcast in. N is a single count() — the one
    driver scalar, needed for the teleport literal. With
    ordered=False the per-dst aggregation is a plain combinable sum
    (use at web scale); ordered=True is the oracle-parity fold.

    cache_static (default on) persists the edge and node frames once:
    every iteration re-reads them, and without the cache a deep edge
    lineage (e.g. edges derived from a full extract->cooccur plan)
    re-executes per iteration — the EdgeCachePass analog. On a real
    cluster this stage is a materialized snapshot instead. Caching does
    not change values, only lineage.

    Each iteration's ranks frame is lineage-truncated (the repo-wide
    iterutil contract: localCheckpoint, or reliable checkpoint under
    `checkpoint_dir` on a cluster) — the update reads ranks TWICE
    (contributions + dangling mass), so without truncation the plan
    doubles per iteration. truncate_lineage=False is the PLAN-AUDIT
    mode only: it skips both the checkpoints and the static caches so
    `explain` shows the raw per-iteration operator shape (never run it
    that way — the doubling is real).

    Returns (node, rank)."""
    from .iterutil import ckpt as _ckpt_impl

    if truncate_lineage:
        ckpt = _ckpt_impl
    else:
        cache_static = False
        ckpt = lambda df, _dir: df  # noqa: E731
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"), w.alias("__w")
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("__s").agg(F.sum("__w").alias("__ow"))
    e = e.join(out_w, "__s")
    if cache_static:
        e = e.cache()
        nodes = nodes.cache()
        out_w = out_w.cache()
    n = nodes.count()
    teleport = (F.lit(1.0) - F.lit(damping)) / F.lit(n)
    ranks = ckpt(
        nodes.select("node", (F.lit(1.0) / F.lit(n)).alias("rank")),
        checkpoint_dir,
    )
    for _ in range(n_iter):
        contribs = e.join(
            ranks.withColumnRenamed("node", "__s"), "__s"
        ).select(
            F.col("__d").alias("node"),
            F.col("__s"),
            (F.col("rank") * F.col("__w") / F.col("__ow")).alias("__c"),
        )
        if ordered:
            summed = contribs.groupBy("node").agg(
                _ordered_sum("__s", "__c").alias("__in")
            )
            dangling = ranks.join(
                out_w.withColumnRenamed("__s", "node"), "node", "left_anti"
            ).agg(F.coalesce(_ordered_sum("node", "rank"), F.lit(0.0)).alias("__dm"))
        else:
            summed = contribs.groupBy("node").agg(F.sum("__c").alias("__in"))
            dangling = ranks.join(
                out_w.withColumnRenamed("__s", "node"), "node", "left_anti"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        ranks = ckpt(
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    teleport
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dm") / F.lit(n)
                    )
                ).alias("rank"),
            ),
            checkpoint_dir,
        )
    return ranks
