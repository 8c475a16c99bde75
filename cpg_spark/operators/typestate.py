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
