"""Structured-Streaming tests: watermarked windowed rollup + incremental
(AvailableNow) resume over a growing pages directory."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.streaming import pipeline as sp


@pytest.fixture()
def pages_dir(tmp_path, spark, pages_df):
    """Write the golden corpus as the first file batch; timestamps in the
    corpus span seconds, so shift them to span hours for windowing."""
    spread = pages_df.withColumn(
        "warc_ts",
        F.col("warc_ts")
        + F.make_interval(hours=F.pmod(F.xxhash64("url"), F.lit(6)).cast("int")),
    )
    d = str(tmp_path / "pages")
    spread.coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _drain(spark, stream, ckpt, name):
    q = sp.run_available_now(stream, ckpt, query_name=name)
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_rollup_matches_batch(spark, pages_dir, alias_df, tmp_path):
    stream = sp.read_page_stream(spark, pages_dir)
    agg = sp.windowed_entity_mentions(stream, alias_df, watermark="1 hour")
    got = _drain(spark, agg, str(tmp_path / "ck1"), "roll1")

    # batch reference: the SAME declarative pipeline executed as a batch
    # (withWatermark is a no-op on batch input)
    batch = spark.read.parquet(pages_dir)
    expected = sp.windowed_entity_mentions(batch, alias_df, watermark="1 hour")
    exp_rows = {
        (r["window_start"], r["entity_id"]): r["n_mentions"]
        for r in expected.collect()
    }
    got_rows = {
        (r["window_start"], r["entity_id"]): r["n_mentions"] for r in got.collect()
    }
    # append mode emits only watermark-closed windows: subset with equal counts
    assert got_rows, "stream emitted nothing — watermark never advanced"
    for k, v in got_rows.items():
        assert exp_rows[k] == v
    # the open tail (last watermark span) is allowed to be missing
    missing = set(exp_rows) - set(got_rows)
    if missing:
        max_start = max(ws for ws, _ in exp_rows)
        assert all(ws >= max_start - __import__("datetime").timedelta(hours=2) for ws, _ in missing)


def test_available_now_resume_processes_only_new_files(
    spark, pages_dir, alias_df, tmp_path, pages_df
):
    ckpt = str(tmp_path / "ck2")
    sink = str(tmp_path / "sink")

    stream = sp.read_page_stream(spark, pages_dir)
    agg = sp.windowed_entity_mentions(stream, alias_df, watermark="1 hour")
    q1 = sp.run_available_now(agg, ckpt, query_name="roll2a", sink_path=sink)
    q1.awaitTermination(120)
    first = spark.read.parquet(sink).collect()

    # append a second batch of files 12 hours later -> watermark advances,
    # previously-open windows close and emit
    later = pages_df.withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 12 HOURS"))
    later.coalesce(1).write.mode("append").parquet(pages_dir)

    stream2 = sp.read_page_stream(spark, pages_dir)
    agg2 = sp.windowed_entity_mentions(stream2, alias_df, watermark="1 hour")
    q2 = sp.run_available_now(agg2, ckpt, query_name="roll2b", sink_path=sink)
    q2.awaitTermination(120)
    both = spark.read.parquet(sink).collect()

    # the resumed drain appended newly-closed windows without re-emitting
    assert len(both) > len(first)
    key = lambda r: (r["window_start"], r["entity_id"])  # noqa: E731
    assert len({key(r) for r in both}) == len(both), "window re-emitted on resume"


def test_dedup_page_stream_drops_recrawls(spark, tmp_path, pages_df):
    """Identical re-crawled content within the watermark is dropped;
    distinct pages all survive."""
    from pyspark.sql import functions as F

    from cpg_spark.streaming.pipeline import (
        dedup_page_stream,
        read_page_stream,
        run_available_now,
    )

    d = str(tmp_path / "pages_dd")
    base = pages_df.limit(10)
    # re-crawl: same html under different urls, later timestamps
    recrawl = base.select(
        F.concat(F.col("url"), F.lit("?recrawl")).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 10 MINUTES")).alias("warc_ts"),
        "html",
        "text",
        "lang",
    )
    base.unionByName(recrawl).coalesce(1).write.mode("overwrite").parquet(d)

    stream = dedup_page_stream(read_page_stream(spark, d))
    q = run_available_now(stream, str(tmp_path / "ckdd"), "dd_stream")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dd_stream").collect()
    # exactly one survivor per distinct content fingerprint
    n_distinct = base.count()
    assert len(out) == n_distinct
    assert len({r["fp"] for r in out}) == n_distinct


def test_ingest_graph_stream_matches_batch(spark, tmp_path, pages_df, alias_df):
    """Streaming KG construction golden: pages arrive as TWO file
    micro-batches, each batch's triples merge into the persistent
    snapshot — and because merge(agg A, agg B) == agg(A u B) exactly,
    the final streamed graph equals the batch-at-once graph
    row-for-row. Also exercises the idempotent pointer commit: a
    replayed batch_id must not double-merge."""
    from cpg_spark.operators import canonicalize, extract, link, materialize

    d = str(tmp_path / "pages_ig")
    half_a = pages_df.filter(F.xxhash64("url") % 2 == 0)
    half_b = pages_df.filter(F.xxhash64("url") % 2 != 0)
    half_a.coalesce(1).write.mode("overwrite").parquet(d)
    half_b.coalesce(1).write.mode("append").parquet(d)

    gdir = str(tmp_path / "graph_ig")
    q = sp.ingest_graph_stream(
        spark, d, alias_df, gdir,
        str(tmp_path / "ck_ig"), max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    streamed = sp.read_current_graph(spark, gdir)

    sent = extract.sentences(pages_df)
    ment = extract.mentions(sent)
    links = link.link_mentions(ment, alias_df)
    comps = canonicalize.canonical_map(alias_df)
    clinks = materialize.canonical_links(links, comps)
    batch = materialize.triples_agg(
        materialize.triples_from_links(clinks, comps)
    )

    key = lambda r: (r["subj"], r["pred"], r["obj"], r["n_evidence"])  # noqa: E731
    assert sorted(map(key, streamed.collect())) == sorted(map(key, batch.collect()))

    # the stream really ran as more than one micro-batch
    import json, os
    with open(os.path.join(gdir, "CURRENT")) as f:
        cur = json.load(f)
    assert cur["batch_id"] >= 1

    # idempotency: replaying an already-committed batch id is a no-op
    before = sorted(map(key, streamed.collect()))
    # a second AvailableNow run over the same checkpoint sees no new
    # files and must leave the snapshot untouched
    q2 = sp.ingest_graph_stream(
        spark, d, alias_df, gdir, str(tmp_path / "ck_ig"),
        max_files_per_trigger=1, query_name="kg_ingest2",
    )
    q2.awaitTermination(120)
    after = sorted(map(key, sp.read_current_graph(spark, gdir).collect()))
    assert after == before


def test_ingest_checkpoint_reset_raises(spark, tmp_path, pages_df, alias_df):
    """Never-silent contract for the snapshot pointer: if the streaming
    checkpoint is deleted or relocated while graph_dir/CURRENT survives,
    batch ids restart at 0 and the old replay guard would silently drop
    every new batch. Both reset signatures must raise, not skip."""
    import json
    import os
    import shutil

    from pyspark.errors.exceptions.captured import StreamingQueryException

    d = str(tmp_path / "pages_cr")
    pages_df.coalesce(1).write.mode("overwrite").parquet(d)
    gdir = str(tmp_path / "graph_cr")
    ck1 = str(tmp_path / "ck_cr1")
    q = sp.ingest_graph_stream(spark, d, alias_df, gdir, ck1)
    q.awaitTermination(180)
    with open(os.path.join(gdir, "CURRENT")) as f:
        cur = json.load(f)
    assert cur["checkpoint_dir"] == os.path.abspath(ck1)

    # append one more file so a fresh checkpoint has a batch to deliver
    pages_df.limit(3).coalesce(1).write.mode("append").parquet(d)

    # relocated checkpoint: different dir -> pointer mismatch -> loud failure
    q2 = sp.ingest_graph_stream(
        spark, d, alias_df, gdir, str(tmp_path / "ck_cr2"),
        query_name="kg_ingest_reset",
    )
    with pytest.raises(StreamingQueryException, match="checkpoint"):
        q2.awaitTermination(120)
        raise AssertionError("relocated checkpoint must fail the stream")

    # deleted-in-place checkpoint: same dir, batch ids restart at 0
    # below the committed id -> loud failure (not a silent skip)
    shutil.rmtree(ck1)
    committed = dict(cur, checkpoint_dir=os.path.abspath(ck1), batch_id=5)
    with open(os.path.join(gdir, "CURRENT"), "w") as f:
        json.dump(committed, f)
    q3 = sp.ingest_graph_stream(
        spark, d, alias_df, gdir, ck1, query_name="kg_ingest_reset2",
    )
    with pytest.raises(StreamingQueryException, match="behind committed"):
        q3.awaitTermination(120)
        raise AssertionError("reset-in-place checkpoint must fail the stream")


def test_ingest_snapshot_retention(spark, tmp_path, pages_df, alias_df):
    """Superseded v* snapshot dirs are pruned after each commit; the
    pointer target always survives."""
    import json
    import os
    import re

    d = str(tmp_path / "pages_rt")
    half_a = pages_df.filter(F.xxhash64("url") % 2 == 0)
    half_b = pages_df.filter(F.xxhash64("url") % 2 != 0)
    half_a.coalesce(1).write.mode("overwrite").parquet(d)
    half_b.coalesce(1).write.mode("append").parquet(d)

    gdir = str(tmp_path / "graph_rt")
    q = sp.ingest_graph_stream(
        spark, d, alias_df, gdir, str(tmp_path / "ck_rt"),
        max_files_per_trigger=1, retain_snapshots=1,
        query_name="kg_ingest_rt",
    )
    q.awaitTermination(180)
    with open(os.path.join(gdir, "CURRENT")) as f:
        cur = json.load(f)
    assert cur["batch_id"] >= 1  # really ran multiple batches
    vdirs = sorted(x for x in os.listdir(gdir) if re.fullmatch(r"v\d{6}", x))
    assert vdirs == [os.path.basename(cur["path"])]
    # the retained snapshot is the readable current graph
    assert sp.read_current_graph(spark, gdir).count() > 0


def test_telemetry_stream_matches_batch(spark, tmp_path, pages_df):
    """Streaming HLL telemetry golden: pages arrive as two file
    micro-batches whose register updates merge by per-register max —
    the final snapshot is bit-identical to the batch-at-once registers
    over the same pages, the estimate follows, and a second
    AvailableNow run over the same checkpoint leaves the snapshot
    untouched."""
    from cpg_spark.functions.hashing import char_poly_hash_col
    from cpg_spark.operators import sketches
    from cpg_spark.operators.textstats import doc_tokens
    from cpg_spark.streaming.pipeline import extract_text_col

    d = str(tmp_path / "pages_tel")
    pages_df.filter(F.xxhash64("url") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    pages_df.filter(F.xxhash64("url") % 2 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    sdir = str(tmp_path / "stats_tel")
    q = sp.telemetry_stream(
        spark, d, sdir, str(tmp_path / "ck_tel"), max_files_per_trigger=1
    )
    q.awaitTermination(180)

    import json
    import os

    with open(os.path.join(sdir, "CURRENT")) as f:
        cur = json.load(f)
    assert cur["batch_id"] >= 1  # really ran as >1 micro-batch
    streamed = spark.read.parquet(cur["path"])

    postings = pages_df.select(
        "url", F.explode(doc_tokens(extract_text_col(F.col("html")))).alias("tok")
    ).select(
        F.lit("corpus").alias("scope"),
        F.concat(
            (char_poly_hash_col(F.col("url")) % F.lit(1 << 30)).cast("string"),
            F.lit("|"),
            F.col("tok"),
        ).alias("posting"),
    )
    batch = sketches.hll_registers(postings, F.col("posting"), ["scope"])

    key = lambda r: (r["scope"], r["reg"], r["rho"])  # noqa: E731
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, batch.collect())
    )
    est = sp.read_current_telemetry(spark, sdir).collect()[0]
    assert est["est_distinct"] > 0

    # idempotent replay: nothing new to read -> snapshot untouched
    before = sorted(map(key, streamed.collect()))
    q2 = sp.telemetry_stream(
        spark, d, sdir, str(tmp_path / "ck_tel"),
        max_files_per_trigger=1, query_name="kg_telemetry2",
    )
    q2.awaitTermination(120)
    with open(os.path.join(sdir, "CURRENT")) as f:
        cur2 = json.load(f)
    after = sorted(map(key, spark.read.parquet(cur2["path"]).collect()))
    assert after == before
