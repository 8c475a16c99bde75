"""Spark-vs-DuckDB comparison used by scripts/check_oracles.py and
tests/test_entry_oracle.py — mirrors the driver's correctness gate:
column names (order-insensitive), row count, and an order-insensitive
multiset compare of stringified values.

Strictness note (round-2 lesson): the driver fetches the DuckDB side
through pandas, where DECIMAL and HUGEINT columns become float64 —
str(Decimal('11640.70')) != str(11640.7), so any query emitting a
decimal/hugeint output column hash-mismatches on trailing-zero values
even when the results are value-identical. We therefore (a) fetch the
oracle via ``res.df()`` here, exactly like the driver, and (b) do NOT
normalize Decimal values — a Spark decimal output column should fail
this check so it gets canonicalized to DOUBLE/BIGINT at the query layer.
"""

from __future__ import annotations

import math
from collections import Counter

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_val(v) -> str:
    # NaN != NaN breaks Counter equality; canonicalize explicitly
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


def normalize(rows, cols) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_val(r[i]) for i in order) for r in rows)


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def compare_query(spark, con, fn, sql, sf_dir: str) -> str | None:
    """Run one (Spark fn, oracle sql) pair; return None if equal, else a
    short diagnostic string."""
    sdf = fn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    pdf = con.sql(sql).df()
    dcols = [c.lower() for c in pdf.columns]
    drows = list(pdf.itertuples(index=False, name=None))
    if sorted(scols) != sorted(dcols):
        return f"columns spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return f"rows spark={len(srows)} duck={len(drows)}"
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    if sn != dn:
        miss = list((dn - sn).items())[:2]
        extra = list((sn - dn).items())[:2]
        return f"values duck-only={miss} spark-only={extra}"
    return None
