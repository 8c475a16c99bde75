#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the KG pipeline
chain (extract → link → canonicalize → triple agg) over a
deterministically synthesized page corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Every query is forced through the noop sink (full materialization — a
bare count() would let Catalyst prune the interesting work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pass_stats_agg",
    "link_bestpick",
    "region_revenue",
    "canon_cc",
    "eog_order_edges",
    "cooccur_parts",
    "events_sessions",
    "link_scope_chain",
    "dfg_reaching_defs",
    "kg_doc_cooccur",
    "ts_fingerprint",
    "dd_minhash",
    "dd_lsh_pairs",
    # the headline Jaccard shapes are the capped/confined ones users
    # should copy at scale; the uncapped exact dd_jaccard stays oracle-only
    "dd_jaccard_capped",
    "dd_jaccard_verify",
    "dd_simhash",
    "sim_cosine_topk",
    "sim_lsh_buckets",
    # round-3 flagship operators: DFA typestate over the event stream,
    # dead-branch-eliminated BFS over corpus chunk EOGs, the
    # operation-production string chain, and corpus term weighting
    "events_order_dfa",
    "eog_corpus_reach",
    "sa_ops_grammar",
    "ts_tfidf_topk",
    "dd_contamination",
    "sim_pq_topk",
    # round-4 flagships: per-path DFA over branching EOGs, bounded
    # loop unrolling in the set evaluator, and the JSON-LD
    # structured-data frontend (trained-PQ is correctness-gated via the
    # registry; its 4x kmeans training is not a headline shape)
    "eog_dfa_branched",
    "eval_loop_unroll",
    "kg_jsonld",
    # curation additions: segment-level boilerplate dedup and the
    # corpus-trained bigram-LM quality filter
    "dd_chunk_dedup",
    "ts_lm_score",
    # round-5 flagships: content-defined (anchor-hash) segment dedup,
    # byte-level payload dedup, the Gopher repetition filter, weighted
    # PageRank over the entity graph, URL canonicalization + domain
    # caps, and the @graph/array-root JSON-LD unwrap
    "dd_anchor_dedup",
    "mm_payload_dedup",
    "ts_gopher_quality",
    # kg_pagerank is benched separately on the real 100k-page triple
    # graph (r6), not via its 8-node oracle fixture — see main()
    "kg_url_curation",
    "kg_jsonld_graph",
    # round-5 late additions: multi-source fusion, graph snapshot diff,
    # quality-temperature resampling, frame-level dedup, the composed
    # IVF-ADC residual-PQ index, and the multi-frontend dispatch golden
    "kg_fuse_sources",
    "kg_snapshot_diff",
    "ts_weighted_sample",
    "mm_frame_dedup",
    "sim_ivfpq_topk",
    "kg_frontend_dispatch",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def kg_chain(spark, pages, alias_dict, cache: bool = True):
    """The full KG construction chain as one lazy plan (no snapshot IO —
    bench measures compute; resume/IO is tested in the pytest suite).
    cache=False is the plan-audit mode: the raw chain, so the audit sees
    every exchange instead of an InMemoryRelation boundary."""
    from pyspark.sql import functions as F

    from cpg_spark.operators import canonicalize, extract, link, materialize

    sent = extract.sentences(pages)
    ment = extract.mentions(sent)
    links = link.link_mentions(ment, alias_dict)
    comps = canonicalize.canonical_map(alias_dict)
    # the fan-out point: three triple branches read clinks — cache it
    # (the real pipeline materializes this stage to a snapshot instead)
    clinks = materialize.canonical_links(links, comps)
    if cache:
        clinks = clinks.cache()
    triples = materialize.triples_from_links(clinks, comps)
    return materialize.triples_agg(triples)


def curation_bench(spark, sf_dir: str) -> dict:
    """The composed curation pipeline as ONE timed run — quality/lang
    gates -> exact dedup -> MinHash-LSH -> confined Jaccard verify ->
    CC canonical pick (plans/curation.curate). The operators all bench
    individually; this is the number a pipeline user actually quotes:
    docs/sec through the whole chain, with per-stage row counts (the
    lineage rows a production run would append per stage snapshot)."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from cpg_spark.plans.curation import curate

    # the testdata parquet is one row group -> a bare scan runs every
    # shingle/minhash kernel in ONE task; repartition to the kernel
    # width like t_par does (on a real cluster the scan has thousands
    # of splits and this is a cheap raw-row shuffle)
    width = int(spark.conf.get("spark.cpg.kernel.width", "8"))
    docs = spark.read.parquet(
        _os.path.join(sf_dir, "documents.parquet")
    ).repartition(width)
    n_docs = docs.count()  # unmeasured (input cardinality, not work)
    best = float("inf")
    stages: dict[str, int] = {}
    for _ in range(2):
        t0 = _time.monotonic()
        res = curate(
            docs,
            target_langs=("en",),
            min_quality=0.3,
            near_dup_jaccard=0.8,
            max_doc_freq=200,
            lsh_max_bucket=64,
        )
        kept = res["kept"].cache()
        n_kept = kept.count()
        drops = {
            r["drop_reason"]: int(r["count"])
            for r in res["dropped"].groupBy("drop_reason").count().collect()
        }
        n_lsh_dropped = res["lsh_dropped_buckets"].count()
        sec = _time.monotonic() - t0
        best = min(best, sec)
        stages = {
            "docs_in": int(n_docs),
            "gate_dropped": drops.get("gate", 0),
            "dup_dropped": drops.get("duplicate", 0),
            "lsh_buckets_capped": int(n_lsh_dropped),
            "kept": int(n_kept),
        }
        kept.unpersist()
        res["unpersist"]()
        spark.catalog.clearCache()
    return {
        "sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
        "stages": stages,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "100000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    from cpg_spark.queries import QUERIES
    from cpg_spark.session import get_spark
    from cpg_spark.synth_spark import alias_dict_df, synth_pages

    spark = get_spark("bench")
    # sandbox memory-bandwidth ceiling: the interpreted HOF kernels peak
    # near 8 streaming workers on this VM (BENCH/BASELINE.md); on a real
    # cluster leave this unset and t_par uses defaultParallelism
    spark.conf.set("spark.cpg.kernel.width", "8")

    # materialize the synthetic corpus once so the measured KG run reads
    # parquet (same shape as the Iceberg pages table)
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")
    pages_path = os.path.join(bench_dir, f"pages_{n_pages}.parquet")
    if not os.path.exists(pages_path):
        synth_pages(spark, n_pages).repartition(64).write.mode("overwrite").parquet(
            pages_path
        )

    # one unmeasured warmup (JIT/codegen) so the first measured query
    # isn't charged for one-time compilation
    force(QUERIES["pass_stats_agg"][0](spark, sf_dir))

    # pinned SENTINEL (r5 verdict ask #8): ts_fingerprint's plan is
    # unchanged since r2 — measured FIRST every run (min of 3, still
    # effectively warmup-adjacent: one small query, no heap pressure),
    # and queries_normalized below divides every timing by it so
    # cross-round comparisons cancel this VM's ±25% ambient weather.
    sentinel_name = "ts_fingerprint"
    sentinel_sec = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        force(QUERIES[sentinel_name][0](spark, sf_dir))
        sentinel_sec = min(sentinel_sec, time.monotonic() - t0)
        spark.catalog.clearCache()
    sentinel_sec = round(sentinel_sec, 3)

    # KG pipeline FIRST, right after warmup (r3 finding: measuring it
    # after ~30 interleaved queries inherits a fragmented JVM heap and
    # depressed the north-rule number by up to 40% run-to-run; the
    # pristine-JVM measurement is the reproducible one). Cap the
    # map-stage concurrency at 8: this VM's memory bandwidth peaks near
    # 8 streaming workers (BENCH/BASELINE.md) — 64 partitions on
    # local[32] thrash it (measured 25k vs 46k triples/s). On a real
    # cluster each executor brings its own bandwidth and the scan's
    # natural splits set the width.
    timings: dict[str, float] = {}
    pages = spark.read.parquet(pages_path).coalesce(8)
    adict = alias_dict_df(spark)
    kg_sec = float("inf")
    for _ in range(3):  # min of 3: the north-rule metric gets the extra run
        t0 = time.monotonic()
        agg = kg_chain(spark, pages, adict)
        n_triples = agg.count()
        kg_sec = min(kg_sec, time.monotonic() - t0)
        spark.catalog.clearCache()
    kg_sec = round(kg_sec, 3)
    timings["kg_pipeline"] = kg_sec

    # kg_pagerank on the REAL kg edge output (r5 verdict ask #3): the
    # oracle fixture ranks an 8-node graph, which measures stage-launch
    # overhead, not the operator. Here the full triple graph of the
    # 100k-page corpus (urls + entities as nodes: mentions,
    # co_occurs_with, typed_as, linked_to edges weighted by evidence)
    # is materialized once and ranked in the documented web-scale mode
    # (ordered=False — combinable sums), 5 iterations.
    from pyspark.sql import functions as F

    from cpg_spark.operators.graphrank import pagerank

    triples_path = os.path.join(bench_dir, f"triples_{n_pages}.parquet")
    if not os.path.exists(triples_path):
        kg_chain(spark, pages, adict, cache=False).write.mode(
            "overwrite"
        ).parquet(triples_path)
        spark.catalog.clearCache()
    pr_edges = spark.read.parquet(triples_path).select(
        F.col("subj").alias("src"),
        F.col("obj").alias("dst"),
        F.col("n_evidence").alias("w"),
    )
    pr_n_edges = pr_edges.count()  # unmeasured (input cardinality)
    pr_n_nodes = (
        pr_edges.select(F.col("src").alias("n"))
        .unionByName(pr_edges.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    pr_sec = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        force(pagerank(pr_edges, n_iter=5, weight_col="w", ordered=False))
        pr_sec = min(pr_sec, time.monotonic() - t0)
        spark.catalog.clearCache()
    timings["kg_pagerank"] = round(pr_sec, 3)

    # min of 2 runs per query: single runs on this VM vary up to 3x with
    # background contention; min-of-warm-runs is the repo's documented
    # methodology (BENCH/BASELINE.md)
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            force(fn(spark, sf_dir))
            best = min(best, time.monotonic() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    cur = curation_bench(spark, sf_dir)
    timings["curation_pipeline"] = cur["sec"]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sentinel": {"name": sentinel_name, "sec": sentinel_sec},
                "queries_normalized": {
                    k: round(v / sentinel_sec, 2) for k, v in timings.items()
                },
                "sf": sf,
                "kg_pages": n_pages,
                "kg_triples": n_triples,
                "kg_pagerank_nodes": int(pr_n_nodes),
                "kg_pagerank_edges": int(pr_n_edges),
                "kg_triples_per_sec": round(n_triples / kg_sec, 1),
                "kg_pages_per_sec": round(n_pages / kg_sec, 1),
                "curation_docs_per_sec": cur["docs_per_sec"],
                "curation_stages": cur["stages"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
