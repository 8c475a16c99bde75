"""applyInPandasWithState sessionization vs the batch window-algebra
twin (queries.q_events_sessions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.streaming import stateful

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events_stream_dir(tmp_path, spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    d = str(tmp_path / "events")
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_stateful_sessions_match_batch(spark, events_stream_dir, tmp_path):
    schema = "user_id long, ts_us long"
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    sessions = stateful.sessionize_stream(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess").collect()
    }

    # batch twin: sessions via lag + cumulative sum (only CLOSED sessions
    # emit on the stream; the last session per user stays open in state)
    ev = spark.read.parquet(events_stream_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap.isNull() | (gap > stateful.SESSION_GAP_US), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("sid", F.sum(is_new).over(wsum))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").alias("start"),
            F.max("ts_us").alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    closed = sess.join(last_sid, "user_id").filter(F.col("sid") != F.col("max_sid"))
    expected = {
        (r["user_id"], r["start"]): (r["end"], r["n"]) for r in closed.collect()
    }

    assert got == expected
    assert len(got) > 0


def test_stateful_sessions_multi_chunk(spark, events_stream_dir, tmp_path):
    """Force tiny Arrow batches so one group spans many chunks in a single
    micro-batch — the ordering bug a within-chunk sort would mask."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        schema = "user_id long, ts_us long"
        stream = spark.readStream.schema(schema).parquet(events_stream_dir)
        sessions = stateful.sessionize_stream(stream)
        q = (
            sessions.writeStream.format("memory")
            .queryName("sess_chunked")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_chunked").collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    ev = spark.read.parquet(events_stream_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap.isNull() | (gap > stateful.SESSION_GAP_US), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("sid", F.sum(is_new).over(wsum))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").alias("start"),
            F.max("ts_us").alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    closed = sess.join(last_sid, "user_id").filter(F.col("sid") != F.col("max_sid"))
    expected = {
        (r["user_id"], r["start"]): (r["end"], r["n"]) for r in closed.collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_dfa_monitor_matches_batch(spark, tmp_path):
    """dfa_monitor_stream vs the batch dfa_evaluate fold on the same
    events: identical violating-key sets, and each streamed violation
    lands at exactly batch violation_idx + 1 events into the key's
    sequence (the reference's single-violation freeze rule)."""
    from cpg_spark.operators.typestate import dfa_evaluate
    from cpg_spark.streaming.stateful import dfa_monitor_stream

    # composite ts makes (key, ts_us) unique so stream order == batch
    # order with no tie ambiguity
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").alias("key_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp")) * 4096
            + F.col("event_id") % 4096
        ).alias("ts_us"),
        F.substring("event_type", 1, 1).alias("symbol"),
    )
    d = str(tmp_path / "ev")
    ev.coalesce(1).write.mode("overwrite").parquet(d)

    # purchase protocol: p before s has no transition (violation)
    trans = (
        {("S0", a): "S0" for a in "cev"}
        | {("S0", "s"): "S1"}
        | {("S1", a): "S1" for a in "cevs"}
        | {("S1", "p"): "S2"}
        | {("S2", a): "S2" for a in "cevsp"}
    )
    stream = spark.readStream.schema("key_id long, ts_us long, symbol string").parquet(d)
    q = (
        dfa_monitor_stream(stream, trans)
        .writeStream.format("memory")
        .queryName("viol")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["key_id"]: r["n_events"] for r in spark.sql("SELECT * FROM viol").collect()
    }

    dfa_rows = spark.createDataFrame(
        [(s, a, t) for (s, a), t in trans.items()],
        "src_state string, symbol string, dst_state string",
    )
    batch = dfa_evaluate(
        spark.read.parquet(d),
        dfa_rows,
        key_cols=["key_id"],
        order_cols=["ts_us"],
        symbol_col="symbol",
        start_state="S0",
        accept_states=("S0", "S1", "S2"),
    )
    expected = {
        r["key_id"]: r["violation_idx"] + 1
        for r in batch.filter(F.col("violation_idx") >= 0).collect()
    }
    assert streamed == expected and len(expected) > 0
