"""cpg_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-imagination of the severinsch/cpg code-property-graph
pipeline (parse -> enrich -> resolve -> canonicalize -> persist; see
/root/reference, SURVEY.md) as a web-scale triple extractor over
Common-Crawl-style page tables:

    pages(url, warc_ts, html binary, text, lang)
      -> extract   (per-partition vectorized text extraction + sentence
                    segmentation; frontend analog of cpg's language
                    frontends, TranslationManager.kt:246-297)
      -> link      (mention detection + entity linking against a broadcast
                    alias dictionary; VariableUsageResolver/CallResolver
                    analog, passes/VariableUsageResolver.kt:63-92)
      -> canonicalize (connected components over candidate-entity edges;
                    TypeResolver dedup / Tarjan SCC analog,
                    passes/TypeResolver.kt:107-144, helper/Components.kt:79-131)
      -> materialize (salted dedup of (subj, pred, obj) triples into
                    node/edge tables; Neo4j-push analog, Application.kt:200-222)

Every stage checkpoints to a snapshot table (Iceberg-style commit protocol
over parquet — Iceberg jars are not in this image; see catalog.py) with
per-partition lineage rows, so a killed job resumes from the last
committed snapshot.

All DataFrame-first: built-in pyspark.sql.functions in the hot path,
Arrow/pandas UDFs only where JVM expressions cannot express the
semantics, no per-row Python anywhere.
"""

__version__ = "0.1.0"
