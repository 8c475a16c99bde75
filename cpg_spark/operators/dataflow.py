"""Per-function dataflow fixpoints — the ControlFlowSensitiveDFGPass
analog (reference cpg-core/.../passes/ControlFlowSensitiveDFGPass.kt:
per function, iterate a worklist over the EOG propagating definition
state until a fixpoint; unreachable EOG edges are skipped, :211-213).

Spark mapping (SURVEY §2.2 #10): the fixpoint is genuinely sequential
WITHIN a function but embarrassingly parallel ACROSS functions, so it
runs as a cogrouped pandas map — one small worklist per function, a
million functions in parallel. This is the sanctioned grouped-map
pattern: per-group imperative logic where window algebra can't express
the loop-carried dependence.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REACHING_SCHEMA = "func_id long, block_id long, var string, def_id long"


def _solve_function(edges_pdf: pd.DataFrame, defs_pdf: pd.DataFrame) -> pd.DataFrame:
    """Classic reaching-definitions worklist on one function's CFG:
    IN[b] = ∪ OUT[p];  OUT[b] = GEN[b] ∪ (IN[b] − KILL[b]).
    Returns the IN sets (defs reaching each block's entry)."""
    if defs_pdf.empty:
        return pd.DataFrame(columns=["func_id", "block_id", "var", "def_id"])
    func_id = int(
        defs_pdf["func_id"].iloc[0]
        if not defs_pdf.empty
        else edges_pdf["func_id"].iloc[0]
    )
    preds: dict[int, list[int]] = defaultdict(list)
    blocks: set[int] = set(defs_pdf["block_id"].tolist())
    for r in edges_pdf.itertuples(index=False):
        preds[int(r.dst_block)].append(int(r.src_block))
        blocks.add(int(r.src_block))
        blocks.add(int(r.dst_block))
    gen: dict[int, set] = defaultdict(set)
    killed_vars: dict[int, set] = defaultdict(set)
    for r in defs_pdf.itertuples(index=False):
        gen[int(r.block_id)].add((r.var, int(r.def_id)))
        killed_vars[int(r.block_id)].add(r.var)

    in_sets: dict[int, set] = {b: set() for b in blocks}
    out_sets: dict[int, set] = {
        b: set(gen[b]) for b in blocks
    }
    work = sorted(blocks)
    while work:
        b = work.pop(0)
        new_in = set()
        for p in preds.get(b, ()):
            new_in |= out_sets[p]
        new_out = gen[b] | {
            (v, d) for (v, d) in new_in if v not in killed_vars[b]
        }
        changed = new_in != in_sets[b] or new_out != out_sets[b]
        in_sets[b], out_sets[b] = new_in, new_out
        if changed:
            for succ in blocks:
                if b in preds.get(succ, ()) and succ not in work:
                    work.append(succ)
    rows = [
        (func_id, b, v, d)
        for b in sorted(blocks)
        for (v, d) in sorted(in_sets[b])
    ]
    return pd.DataFrame(rows, columns=["func_id", "block_id", "var", "def_id"])


def reaching_definitions(edges: DataFrame, defs: DataFrame) -> DataFrame:
    """Reaching definitions at block entry, per function.

    edges(func_id, src_block, dst_block [, unreachable]) — CFG edges;
    rows flagged `unreachable` are skipped before the fixpoint (the
    ControlFlowSensitiveDFGPass.kt:211-213 consumption of
    UnreachableEOGPass output). defs(func_id, block_id, var, def_id).
    Returns (func_id, block_id, var, def_id) — one row per definition
    reaching each block's entry."""
    if "unreachable" in edges.columns:
        edges = edges.filter(~F.coalesce(F.col("unreachable"), F.lit(False)))
    e = edges.select("func_id", "src_block", "dst_block")
    d = defs.select("func_id", "block_id", "var", "def_id")
    # pre-partition both sides by key at the session width (the
    # bfs_reach_grouped rule): AQE would coalesce the cogroup's tiny
    # shuffles to one partition and serialize every per-function pandas
    # call through a single Python worker; matching explicit widths on
    # both sides also satisfies the cogroup's distribution requirement
    # with no extra exchange
    spark = e.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = e.repartition(width, "func_id")
    d = d.repartition(width, "func_id")

    def solve(key, edges_pdf, defs_pdf):
        out = _solve_function(edges_pdf, defs_pdf)
        out["func_id"] = int(key[0])
        return out[["func_id", "block_id", "var", "def_id"]]

    return (
        e.groupBy("func_id")
        .cogroup(d.groupBy("func_id"))
        .applyInPandas(solve, REACHING_SCHEMA)
    )
