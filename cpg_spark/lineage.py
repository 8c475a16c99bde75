"""Per-stage, per-partition lineage rows (FIXTURES.md §6 schema).

The reference wraps every frontend run and pass in a Benchmark object and
keeps the rows in an in-memory StatisticsHolder
(helpers/MeasurementHolder.kt:39-84, TranslationManager.kt:78-109); here
the same rows are durable — appended to a lineage table in the warehouse
so a resumed run can show what it skipped.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import LINEAGE

LINEAGE_TABLE = "_lineage"


def partition_counts(df: DataFrame) -> list[tuple[int, int]]:
    """(partition_id, rows) of df as currently partitioned — one cheap
    extra job; call on a cached stage output."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [(int(r["pid"]), int(r["count"])) for r in rows]


def append_lineage(
    spark: SparkSession,
    warehouse: str,
    run_id: str,
    stage: str,
    input_split: str,
    rows_in: int | None,
    per_partition_out: list[tuple[int, int]],
    wall_ms: int,
    snapshot_id: int | None,
) -> None:
    recs = [
        (
            run_id,
            stage,
            pid,
            input_split,
            rows_in,
            n,
            wall_ms,
            snapshot_id,
        )
        for pid, n in (per_partition_out or [(0, 0)])
    ]
    df = spark.createDataFrame(recs, LINEAGE)
    path = os.path.join(warehouse, LINEAGE_TABLE)
    df.coalesce(1).write.mode("append").parquet(path)


def read_lineage(spark: SparkSession, warehouse: str) -> DataFrame:
    return spark.read.schema(LINEAGE).parquet(os.path.join(warehouse, LINEAGE_TABLE))


class StageTimer:
    def __init__(self) -> None:
        self.t0 = time.time()

    def wall_ms(self) -> int:
        return int((time.time() - self.t0) * 1000)
