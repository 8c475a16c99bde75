"""Deterministic content-hash identifiers.

The reference assigns ids either sequentially (fork IdentifierPass.kt:33-50,
`lastId++` — single-threaded by design) or at Neo4j save time (OGM
@GeneratedValue, Node.kt:174). Neither survives distributed execution:
ids must be stable across runs AND across parallelism levels, so every id
here is a content hash. Never `monotonically_increasing_id` (stable only
within one run's partition layout).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_id(*cols: Column | str, prefix: str = "") -> Column:
    """64-bit content hash rendered as a fixed-width hex string id.

    xxhash64 is JVM-side and codegen'd; the prefix namespaces id spaces
    (entities vs inferred entities vs pages).
    """
    h = F.lower(F.hex(F.xxhash64(*cols)))
    padded = F.lpad(h, 16, "0")
    return F.concat(F.lit(prefix), padded) if prefix else padded


def entity_id_py(name: str, entity_type: str) -> str:
    """Driver/golden-side entity id: stable sha1-derived (not xxhash —
    golden fixtures only need determinism, not JVM parity)."""
    digest = hashlib.sha1(f"{entity_type}\x00{name}".encode()).hexdigest()[:12]
    return f"e:{digest}"


def inferred_id_py(alias_norm: str) -> str:
    digest = hashlib.sha1(f"inferred\x00{alias_norm}".encode()).hexdigest()[:12]
    return f"inf:{digest}"


def inferred_id_col(alias_norm: Column) -> Column:
    """JVM-side twin of inferred_id_py (sha1 available as F.sha1)."""
    return F.concat(
        F.lit("inf:"),
        F.substring(F.sha1(F.encode(F.concat(F.lit("inferred\x00"), alias_norm), "UTF-8")), 1, 12),
    )
