"""Strict representation diff for hash-red queries: prints Spark dtypes,
DuckDB result types, and the first differing raw reprs (no normalization)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from collections import Counter

from cpg_spark.session import get_spark
from cpg_spark.oracle_check import register_views
from cpg_spark.queries import QUERIES

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
names = sys.argv[1:] or [
    "pass_stats_agg", "link_bestpick", "brand_price_rank",
    "events_hourly", "events_sessions",
]

spark = get_spark()
con = duckdb.connect()
register_views(con, SF)

for name in names:
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = con.sql(sql)
    dcols = [c.lower() for c in res.columns]
    dtypes = [str(t) for t in res.types]
    drows = res.fetchall()
    print(f"== {name}")
    print(f"  spark dtypes: {sdf.dtypes}")
    print(f"  duck  types : {list(zip(dcols, dtypes))}")
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sn = Counter(tuple(repr(r[i]) for i in order_s) for r in srows)
    dn = Counter(tuple(repr(r[i]) for i in order_d) for r in drows)
    if sn == dn:
        print("  repr-identical")
    else:
        miss = list((dn - sn).items())[:3]
        extra = list((sn - dn).items())[:3]
        print(f"  duck-only : {miss}")
        print(f"  spark-only: {extra}")
spark.stop()
