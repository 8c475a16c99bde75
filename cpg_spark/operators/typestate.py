"""Configurable DFA typestate evaluation over per-key ordered event
sequences — the DFAOrderEvaluator analog (reference
cpg-analysis/.../analysis/fsm/DFAOrderEvaluator.kt:72-520 walks the EOG
per base object, feeding each call's op into a DFA;
fsm/DFA.kt:82-101 makeTransitionWithOp returns false on a missing
transition, which triggers actionMissingTransitionForNode — a
violation; termination in a non-accepting state triggers
actionNonAcceptingTermination).

Spark shape: the transition table is dictionary-sized, so it becomes a
LITERAL MAP folded over each key's sorted symbol array — one shuffle
(the groupBy), zero joins, whole-stage codegen. Per-key sequences are
pre-truncated with a window rank BEFORE collection (never an unbounded
per-key array — the capped-witness pattern), with a `truncated` flag so
the cap is never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dfa_evaluate(
    events: DataFrame,
    transitions: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    symbol_col: str,
    start_state: str = "S0",
    accept_states: tuple[str, ...] = (),
    max_events: int = 10_000,
) -> DataFrame:
    """Evaluate a DFA along each key's ordered symbol sequence.

    transitions(src_state string, symbol string, dst_state string) —
    the user-supplied table the reference's DFA constructor takes; it is
    collected (tiny by construction) into a literal map, the broadcast
    analog without even a join.

    Per key, symbols are applied in (order_cols) order from start_state.
    A symbol with NO transition from the current state is an order
    violation (actionMissingTransitionForNode): the walk freezes in the
    state where it got stuck and violation_idx records the 0-based
    offending position. Otherwise ok = final state ∈ accept_states
    (actionAcceptingTermination / actionNonAcceptingTermination).

    Returns: key_cols + (n_events, truncated, final_state, ok,
    violation_idx); violation_idx = -1 when the full (capped) sequence
    ran clean.
    """
    rows = transitions.select("src_state", "symbol", "dst_state").collect()
    kv: list = []
    for r in rows:
        kv.append(F.lit(f"{r['src_state']}\x00{r['symbol']}"))
        kv.append(F.lit(r["dst_state"]))
    trans_map = F.create_map(*kv) if kv else F.create_map()

    w = Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in order_cols])
    ranked = events.withColumn("__rn", F.row_number().over(w))
    ordered_key = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.col(symbol_col).alias("__sym"),
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("__rn") > max_events).alias("truncated"),
        F.transform(
            F.array_sort(
                F.collect_list(F.when(F.col("__rn") <= max_events, ordered_key))
            ),
            lambda x: x.getField("__sym"),
        ).alias("__syms"),
    )
    init = F.struct(
        F.lit(start_state).alias("state"),
        F.lit(-1).alias("viol"),
        F.lit(0).alias("i"),
    )

    def step(acc, sym):
        nxt = F.try_element_at(
            trans_map, F.concat(acc.getField("state"), F.lit("\x00"), sym)
        )
        advanced = F.struct(
            F.coalesce(nxt, acc.getField("state")).alias("state"),
            F.when(nxt.isNull(), acc.getField("i")).otherwise(F.lit(-1)).alias("viol"),
            (acc.getField("i") + 1).alias("i"),
        )
        return F.when(acc.getField("viol") >= 0, acc).otherwise(advanced)

    run = F.aggregate(F.col("__syms"), init, step)
    violated = run.getField("viol") >= 0
    return agg.select(
        *key_cols,
        "n_events",
        "truncated",
        run.getField("state").alias("final_state"),
        (
            ~violated & run.getField("state").isin(list(accept_states))
        ).alias("ok"),
        run.getField("viol").alias("violation_idx"),
    )


def dfa_evaluate_branched(
    nodes: DataFrame,
    edges: DataFrame,
    transitions: DataFrame,
    key_col: str,
    start_state: str = "S0",
    accept_states: tuple[str, ...] = (),
    max_depth: int = 64,
    max_paths: int = 10_000,
    honor_unreachable: bool = True,
) -> DataFrame:
    """DFA evaluation over a BRANCHED per-object EOG, one verdict per
    path — the part of the reference's DFAOrderEvaluator that
    dfa_evaluate's single-sequence fold cannot express (reference
    cpg-analysis/.../analysis/fsm/DFAOrderEvaluator.kt:72-520 walks the
    EOG per base object with a worklist that FORKS at branch nodes,
    because a call sequence can be clean on one branch and violating on
    the other; dfa_evaluate assumes one total order per key).

    nodes(key_col, node, symbol): every EOG node emits one symbol.
    edges(key_col, src, dst[, unreachable]): the branched EOG; dead
    edges (UnreachableEOGPass flags) are skipped when
    honor_unreachable — an eliminated branch contributes no paths,
    the reference's consumption rule. transitions(src_state, symbol,
    dst_state) is dictionary-sized and closes over the walker.

    Per key: entry nodes are those with no incoming live edge; every
    entry-to-terminal path (terminal = no outgoing live edge) up to
    max_depth nodes is walked, consuming each visited node's symbol
    from start_state. A missing transition freezes the state and
    records the 0-based violation position (the walk still completes
    the path so the verdict names the full witness); otherwise ok =
    final state ∈ accept_states.

    Never silent (two hardening rules on top of the capped-witness
    pattern): a strongly-cyclic group — a `while` back-edge region with
    NO entry node, which the reference's worklist enters from the
    function head — is walked from its lexicographically-smallest node
    as a synthetic entry, every emitted row flagged truncated (the
    entry choice is an under-approximation); and a group that still
    produces zero verdicts (pure cycle with no terminal, or every path
    depth-capped) emits ONE diagnostic row (path NULL, n_nodes 0,
    truncated true) so the caller sees the group was skipped rather
    than inferring emptiness. An edge endpoint with no nodes row is
    skipped, not KeyError'd (skip-don't-fail,
    TranslationManager.kt:347-351), and flags the group truncated.

    Spark shape: per-object EOGs are SMALL PRIVATE DAGs (the
    bfs_reach_grouped argument — the reference walks them sequentially
    per object for the same reason), so the enumeration runs inside the
    Python workers after one shuffle, millions of keys in parallel,
    zero driver iterations. Nodes and edges are unioned into one tagged
    frame (not cogrouped — shared-lineage inputs trip the
    ambiguous-self-join analyzer). Paths/depth are capped with a
    per-key `truncated` flag — bounded, never silent (capped-witness
    pattern).

    r7 shape: partition-streaming mapInPandas (one Python call + one
    output frame per ARROW BATCH) instead of groupBy().applyInPandas
    (one per GROUP) — the per-group invocation and pandas-construction
    overhead dominated at ~50k dictionary-sized groups (guide §2.3;
    same rewrite as bfs_reach_grouped, identical output rows). Groups
    are made contiguous by a hash repartition + local sort on the key;
    the open tail group carries across batch boundaries.

    Returns (key_col, path string 'n0>n1>…', n_nodes int, final_state,
    ok boolean, violation_idx int, truncated boolean); violation_idx =
    -1 for a clean path."""
    trans = {
        (r["src_state"], r["symbol"]): r["dst_state"]
        for r in transitions.select("src_state", "symbol", "dst_state").collect()
    }
    if honor_unreachable and "unreachable" in edges.columns:
        edges = edges.filter(~F.coalesce(F.col("unreachable"), F.lit(False)))
    n = nodes.select(
        key_col,
        F.col("node").alias("__a"),
        F.col("node").alias("__b"),
        F.col("symbol").alias("__sym"),
        F.lit(False).alias("__is_edge"),
    )
    e = edges.select(
        key_col,
        F.col("src").alias("__a"),
        F.col("dst").alias("__b"),
        F.lit(None).cast("string").alias("__sym"),
        F.lit(True).alias("__is_edge"),
    )
    both = n.unionByName(e)
    spark = both.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    both = both.repartition(width, key_col).sortWithinPartitions(key_col)
    ktype = n.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {ktype}, path string, n_nodes int, final_state string, "
        "ok boolean, violation_idx int, truncated boolean"
    )
    accept = set(accept_states)
    COLS = ("path", "n_nodes", "final_state", "ok", "violation_idx", "truncated")

    def solve_group(key, a, b, sym, is_edge, out):
        syms: dict = {}
        adj: dict = {}
        has_in: set = set()
        for x, y, sm, ed in zip(a, b, sym, is_edge):
            if ed:
                adj.setdefault(x, []).append(y)
                has_in.add(y)
            else:
                syms[x] = sm
        entries = sorted(k for k in syms if k not in has_in)
        rows = []
        truncated = False
        if not entries and syms:
            # all-cycle group: synthetic entry at the smallest node,
            # results flagged truncated (see docstring)
            entries = [min(syms)]
            truncated = True
        # iterative DFS; each stack entry is a complete walk prefix
        stack = []
        for ent in reversed(entries):
            s2 = trans.get((start_state, syms[ent]))
            stack.append(
                ([ent], s2 if s2 is not None else start_state,
                 -1 if s2 is not None else 0)
            )
        while stack:
            path, state, viol = stack.pop()
            succs = sorted(set(adj.get(path[-1], ())))
            dangling = [s for s in succs if s not in syms]
            if dangling:
                # edge endpoint with no nodes row: skip it, flag the group
                succs = [s for s in succs if s in syms]
                truncated = True
            if not succs:
                if len(rows) >= max_paths:
                    truncated = True
                    break
                rows.append((">".join(map(str, path)), len(path), state, viol))
                continue
            if len(path) >= max_depth:
                truncated = True  # unterminated path dropped, flagged
                continue
            for s in reversed(succs):
                if viol >= 0:
                    stack.append((path + [s], state, viol))
                else:
                    nx = trans.get((state, syms[s]))
                    stack.append(
                        (path + [s], nx if nx is not None else state,
                         -1 if nx is not None else len(path))
                    )
        if not rows and syms:
            # zero verdicts for a non-empty group (pure cycle, or all
            # paths depth-capped): one diagnostic row, never silence
            out["key"].append(key)
            out["path"].append(None)
            out["n_nodes"].append(0)
            out["final_state"].append(None)
            out["ok"].append(False)
            out["violation_idx"].append(-1)
            out["truncated"].append(True)
            return
        out["key"].extend([key] * len(rows))
        out["path"].extend(r[0] for r in rows)
        out["n_nodes"].extend(r[1] for r in rows)
        out["final_state"].extend(r[2] for r in rows)
        out["ok"].extend(r[3] < 0 and r[2] in accept for r in rows)
        out["violation_idx"].extend(r[3] for r in rows)
        out["truncated"].extend([truncated] * len(rows))

    def run(batches):
        import numpy as np
        import pandas as pd

        def new_out():
            return {"key": [], **{c: [] for c in COLS}}

        def to_pdf(out):
            data = {key_col: out["key"]}
            data.update({c: out[c] for c in COLS})
            return pd.DataFrame(data)

        def process(pdf, out):
            keys = pdf[key_col].to_numpy()
            a = pdf["__a"].to_numpy()
            b = pdf["__b"].to_numpy()
            sym = pdf["__sym"].to_numpy()
            ed = pdf["__is_edge"].to_numpy()
            cuts = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [len(keys)]))
            for st, en in zip(starts, ends):
                solve_group(
                    keys[st], a[st:en], b[st:en], sym[st:en], ed[st:en], out
                )

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            keys = pdf[key_col].to_numpy()
            cut = int(np.searchsorted(keys, keys[-1], side="left"))
            carry = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            if len(head):
                out = new_out()
                process(head, out)
                if out["key"]:
                    yield to_pdf(out)
        if carry is not None and len(carry):
            out = new_out()
            process(carry, out)
            if out["key"]:
                yield to_pdf(out)

    return both.mapInPandas(run, out_schema)
