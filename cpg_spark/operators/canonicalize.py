"""Canonicalize stage: cross-partition connected components.

The TypeResolver-dedup / Tarjan-SCC analog (reference
passes/TypeResolver.kt:107-144 unifies duplicate types globally;
helper/Components.kt:79-131 runs recursive Tarjan on the driver). Neither
survives 10^12 rows, so this is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond") — O(log n) rounds of pure DataFrame joins, each round
checkpointed to truncate lineage, deterministic via lexicographic min on
content-hash ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checksum(df: DataFrame) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: connect all strictly larger neighbors to
    min(neighborhood ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient high->low, then for each u: connect all low neighbors and u
    itself to the minimum."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _unionfind_driver(e: DataFrame) -> DataFrame:
    """Driver-side union-find for dictionary-sized edge sets. The
    reference runs Tarjan on the driver unconditionally
    (Components.kt:97-131); here it is gated behind a size threshold
    where a collect is strictly cheaper than ~log(n) shuffle rounds —
    the distributed large-star/small-star path remains the scale path."""
    rows = e.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        u, v = r["u"], r["v"]
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    nodes = {x for r in rows for x in (r["u"], r["v"])}
    out = [(m, find(m)) for m in sorted(nodes)]
    spark = e.sparkSession
    dt = e.schema["u"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("member_id", dt), StructField("component_id", dt)]
    )
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_threshold: int = 10_000,
) -> DataFrame:
    """(member_id, component_id) for every node appearing in `edges`;
    component_id = lexicographic min member id.

    Edge sets up to `driver_threshold` run as driver-side union-find (a
    collect beats log(n) shuffle rounds); larger graphs run the
    alternating-star loop, each iteration localCheckpointed (lineage
    truncation). Convergence = stable (count, checksum) of the edge set.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    if 0 < n_edges <= driver_threshold:
        return _unionfind_driver(e)
    # adaptive layout: a dictionary-sized graph must not pay a
    # 32-partition shuffle x ~10 iterations of driver round-trips; a
    # web-sized graph keeps the session's full shuffle width
    spark = e.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    nparts = max(1, min(width, n_edges // 50_000 + 1))
    if nparts < width:
        e = e.repartition(nparts, "u").localCheckpoint(eager=True)

    all_nodes = (
        e.select(F.col("u").alias("member_id"))
        .union(e.select(F.col("v").alias("member_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if n_edges == 0:
        return all_nodes.select(
            "member_id", F.col("member_id").alias("component_id")
        )

    prev = None
    for _ in range(max_iter):
        # lazy checkpoint: the checksum action both materializes the
        # iteration (truncating lineage) and tests convergence — one
        # driver round-trip per round instead of two
        step = _small_star(_large_star(e))
        if nparts < width:
            step = step.repartition(nparts, "u")
        e = step.localCheckpoint(eager=False)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur

    # converged: e is a forest of depth-1 stars (u -> root), u > root;
    # min() guards against a node carrying two star edges at the cap
    labels = e.groupBy(F.col("u").alias("member_id")).agg(
        F.min("v").alias("component_id")
    )
    return (
        all_nodes.join(labels, "member_id", "left")
        .select(
            "member_id",
            F.coalesce("component_id", "member_id").alias("component_id"),
        )
    )


def bfs_reach(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 20,
) -> DataFrame:
    """All nodes reachable from `seeds` (column `node`) following edges
    forward, with minimal hop count — the reference's BFS path followers
    (Extensions.kt:210-435 followNextDFGEdgesUntilHit et al.) as
    iterative frontier joins with an anti-join visited set.

    Each round: frontier ⋈ edges → candidates, minus visited (anti-join),
    checkpoint. Terminates when the frontier empties or max_hops."""
    visited = seeds.select(F.col("node"), F.lit(0).alias("hops")).localCheckpoint(
        eager=True
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(hop).alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def dict_duplicate_edges(alias_dict: DataFrame) -> DataFrame:
    """Candidate-entity duplicate edges: entities sharing an
    (alias, entity_type) are duplicate candidates (the TypeResolver
    equal-type signal). Emitted as (root=min member, member) star edges
    per group — already near-canonical, CC then merges overlapping
    groups (the chain fixture)."""
    grouped = alias_dict.groupBy("alias", "entity_type").agg(
        F.min("entity_id").alias("src"),
        F.collect_set("entity_id").alias("members"),
    )
    return (
        grouped.select("src", F.explode("members").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def canonical_map(alias_dict: DataFrame) -> DataFrame:
    """member_id -> component_id over dictionary-duplicate edges, covering
    ALL dictionary entities (singletons map to themselves)."""
    edges = dict_duplicate_edges(alias_dict)
    cc = connected_components(edges)
    everyone = alias_dict.select(F.col("entity_id").alias("member_id")).distinct()
    return everyone.join(cc, "member_id", "left").select(
        "member_id", F.coalesce("component_id", "member_id").alias("component_id")
    )
