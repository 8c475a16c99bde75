"""Deterministic sampling operators for training-data curation.

A 100 TB corpus pipeline needs samples that are (a) reproducible across
runs and cluster sizes, (b) stratifiable by group with per-stratum
rates, and (c) expressible as pure Column arithmetic so Catalyst pushes
them into the scan stage. `df.sample()` fails (a): its Bernoulli draw
depends on partition layout. Everything here keys off the same
engine-portable polynomial content hash the dedup operators use
(functions/hashing.char_poly_hash_col), so the DuckDB oracle reproduces
every sample bit-for-bit and a re-run selects the identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import CHAR_POLY_P, char_poly_hash_col, char_poly_hash_sql

# hash space is [0, CHAR_POLY_P); rates map to a threshold in that space.
# The raw polynomial fold is nearly linear in short keys (hash("42") is
# tiny), so sampling mixes it through a multiplicative spread (Knuth's
# 2654435761) plus a second independent fold — equidistributed over the
# space even for consecutive integer keys, and exactly reproducible in
# any engine with 64-bit integers.
_MIX = 2654435761


def _sample_hash_col(key, salt: str):
    s = F.concat(F.lit(salt), key.cast("string"))
    return (
        char_poly_hash_col(s) * F.lit(_MIX)
        + char_poly_hash_col(F.concat(F.lit("\x01"), s))
    ) % F.lit(CHAR_POLY_P)


def sample_hash_sql(expr: str, salt: str) -> str:
    """DuckDB twin of the sampling hash (oracle reproducibility)."""
    s = f"'{salt}' || CAST({expr} AS VARCHAR)"
    s2 = f"chr(1) || {s}"
    return (
        f"({char_poly_hash_sql(s)} * {_MIX} "
        f"+ {char_poly_hash_sql(s2)}) % {CHAR_POLY_P}"
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose content-hash bucket falls under `rate` — a
    deterministic Bernoulli sample on the key. Same key ⇒ same decision
    in every run, at any parallelism, in any engine with the same hash.
    `salt` decorrelates independent samples over the same keys."""
    h = _sample_hash_col(F.col(key_col), salt)
    return df.filter(h < int(rate * CHAR_POLY_P))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: `rates` maps stratum value →
    keep rate (e.g. {'en': 0.1, 'de': 0.5}); strata not listed keep
    `default_rate`. The rate table becomes one codegen'd CASE chain —
    no join, no shuffle, pushed to the scan."""
    h = _sample_hash_col(F.col(key_col), salt)
    thr = F.lit(int(default_rate * CHAR_POLY_P))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(rate * CHAR_POLY_P))
        ).otherwise(thr)
    return df.filter(h < thr)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    temperature: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Quality-weighted (temperature) resampling — the corpus-mixing
    step after scoring: each row survives with probability
    weight^temperature (weight in [0,1]; temperature > 1 sharpens
    toward high-quality documents, < 1 flattens — the data-mixture
    temperature knob of CCNet-style pipelines), decided by the SAME
    deterministic content hash as every sampler here: same key and
    weight ⇒ same decision at any parallelism, in any engine.

    Integer temperatures expand to repeated multiplication so the
    threshold doubles are bit-identical across engines (the oracle
    float rule — pow()'s last ulp is libm-dependent); fractional
    temperatures fall back to pow() and give up exact oracle parity,
    never correctness. Pure scan-stage filter, no shuffle."""
    w = F.col(weight_col)
    if float(temperature).is_integer() and temperature >= 0:
        wt = F.lit(1.0)
        for _ in range(int(temperature)):
            wt = wt * w
    else:
        wt = F.pow(w, F.lit(float(temperature)))
    h = _sample_hash_col(F.col(key_col), salt).cast("double")
    return df.filter(h < wt * F.lit(float(CHAR_POLY_P)))


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """Bounded per-group selection (the reservoir shape): the k best rows
    per group by `order_col`, deterministic tie-break. One window rank —
    shuffles once on the group key, never collects a group into memory
    (rank streams through the sort)."""
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    if tie_break is not None:
        order.append(F.asc(tie_break))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
