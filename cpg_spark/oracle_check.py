"""Spark-vs-DuckDB comparison used by scripts/check_oracles.py and
tests/test_entry_oracle.py — mirrors the driver's correctness gate:
column names (order-insensitive), row count, and an order-insensitive
multiset compare of normalized values.
"""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_val(v) -> str:
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
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
    res = con.sql(sql)
    dcols = [c.lower() for c in res.columns]
    drows = res.fetchall()
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
