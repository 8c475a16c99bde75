"""Configurable DFA typestate evaluator (DFAOrderEvaluator analog)."""

from __future__ import annotations

from cpg_spark.operators.typestate import dfa_evaluate


def _dfa(spark, rows):
    return spark.createDataFrame(
        rows, "src_state string, symbol string, dst_state string"
    )


def _events(spark, rows):
    return spark.createDataFrame(rows, "k string, t int, sym string")


def test_dfa_accepting_and_violating(spark):
    """open -> use* -> close protocol: u before o is a missing
    transition (violation frozen at S0 with its index); terminating
    after open without close is non-accepting but NOT a violation."""
    dfa = _dfa(
        spark,
        [("S0", "o", "OPEN"), ("OPEN", "u", "OPEN"), ("OPEN", "c", "S0")],
    )
    ev = _events(
        spark,
        [
            ("good", 0, "o"), ("good", 1, "u"), ("good", 2, "c"),
            ("early_use", 0, "u"), ("early_use", 1, "o"),
            ("no_close", 0, "o"), ("no_close", 1, "u"),
        ],
    )
    out = {
        r["k"]: r
        for r in dfa_evaluate(
            ev, dfa, ["k"], ["t"], "sym", "S0", ("S0",)
        ).collect()
    }
    assert out["good"]["ok"] and out["good"]["final_state"] == "S0"
    assert out["good"]["violation_idx"] == -1
    # missing transition at position 0: frozen state, index recorded
    assert not out["early_use"]["ok"]
    assert out["early_use"]["final_state"] == "S0"
    assert out["early_use"]["violation_idx"] == 0
    # clean walk, non-accepting termination
    assert not out["no_close"]["ok"]
    assert out["no_close"]["final_state"] == "OPEN"
    assert out["no_close"]["violation_idx"] == -1


def test_dfa_violation_freezes_walk(spark):
    """Symbols after the violating one are ignored (the reference stops
    interpreting the base after a missing transition)."""
    dfa = _dfa(spark, [("S0", "a", "S1"), ("S1", "b", "S2")])
    ev = _events(
        spark, [("x", 0, "a"), ("x", 1, "z"), ("x", 2, "b")]
    )
    row = dfa_evaluate(ev, dfa, ["k"], ["t"], "sym", "S0", ("S2",)).collect()[0]
    assert row["violation_idx"] == 1
    assert row["final_state"] == "S1"  # frozen where it got stuck
    assert not row["ok"]


def test_dfa_cap_truncates_with_flag(spark):
    """max_events pre-truncates per key via window rank — bounded
    per-group state — and reports it, never silently."""
    dfa = _dfa(spark, [("S0", "a", "S0")])
    ev = _events(spark, [("k1", i, "a") for i in range(10)])
    row = dfa_evaluate(
        ev, dfa, ["k"], ["t"], "sym", "S0", ("S0",), max_events=3
    ).collect()[0]
    assert row["n_events"] == 10
    assert row["truncated"] is True
    assert row["ok"]


def test_dfa_order_is_by_order_cols(spark):
    """Sequence order comes from order_cols, not input row order."""
    dfa = _dfa(spark, [("S0", "a", "S1"), ("S1", "b", "S2")])
    ev = _events(spark, [("k", 1, "b"), ("k", 0, "a")])  # shuffled input
    row = dfa_evaluate(ev, dfa, ["k"], ["t"], "sym", "S0", ("S2",)).collect()[0]
    assert row["ok"] and row["final_state"] == "S2"
