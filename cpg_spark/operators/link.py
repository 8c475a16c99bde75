"""Link stage: mention -> canonical-candidate entity resolution.

The VariableUsageResolver / CallResolver analog (reference
passes/VariableUsageResolver.kt:63-92, CallResolver.kt:68): resolve each
reference (mention) against a symbol table (broadcast alias dictionary),
pick the best candidate, and create inferred entities for unresolved
references (reference inference/Inference.kt:57-343).

Scale design: the dictionary is pre-resolved to its best candidate per
alias ONCE (a window over the tiny dict), so the big-side resolution is a
single broadcast hash join — zero shuffle on the mention stream. The
scored variant (link_candidates) keeps all candidates for diagnostics and
demonstrates the window best-pick on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import inferred_id_col


def best_alias_dict(alias_dict: DataFrame) -> DataFrame:
    """Resolve ambiguity inside the dictionary: one best entity per alias
    (highest prior, tie-break min entity_id) — the innermost-scope pick
    (reference ScopeManager.resolveReference, ScopeManager.kt:625-653)
    applied to the symbol table once instead of per reference."""
    w = Window.partitionBy("alias").orderBy(F.desc("prior"), F.asc("entity_id"))
    return (
        alias_dict.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def link_mentions(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """mentions x broadcast(best-per-alias dict) -> LINKS schema.

    Unmatched mentions become inferred entities with deterministic
    content-hash ids (never null, never sequence-assigned)."""
    best = best_alias_dict(alias_dict)
    joined = mentions.join(
        F.broadcast(best), mentions["alias_norm"] == best["alias"], "left"
    )
    return joined.select(
        "url",
        "sent_idx",
        "tok_idx",
        "alias_norm",
        F.coalesce(F.col("entity_id"), inferred_id_col(F.col("alias_norm"))).alias(
            "entity_id"
        ),
        F.coalesce(F.col("entity_name"), F.col("surface")).alias("entity_name"),
        F.coalesce(F.col("entity_type"), F.lit("UNKNOWN")).alias("entity_type"),
        F.coalesce(F.col("prior"), F.lit(0.0)).alias("score"),
        F.col("entity_id").isNull().alias("is_inferred"),
    )


def link_candidates(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """All-candidate scoring variant: keeps every (mention, candidate)
    pair with a rank — the CallResolver signature-scoring analog
    (reference SymbolResolverPass.kt:81-94). Broadcast join + window
    best-pick on the big side."""
    joined = mentions.join(
        F.broadcast(alias_dict), mentions["alias_norm"] == alias_dict["alias"], "inner"
    )
    w = Window.partitionBy("url", "sent_idx", "tok_idx").orderBy(
        F.desc("prior"), F.asc("entity_id")
    )
    return joined.withColumn("cand_rank", F.row_number().over(w))
