"""Extract stage: pages -> extracted text -> sentences -> mentions.

The language-frontend analog (reference TranslationManager.kt:246-297
parses files in parallel with per-file state; here each page row is
independent, so the stage is a pure map — no shuffle at all until the
caller aggregates). Everything is JVM Column expressions inside
whole-stage codegen; the pandas variant exists only to prove the
byte-identical contract from a second implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import extract_text_col, sentences_col
from ..synth import MENTION_REGEX, TARGET_LANGS


def extracted_text(pages: DataFrame) -> DataFrame:
    """(url, lang, text) with text derived from html bytes.

    Byte-identical per url to the page's original text (BASELINE.json
    per-row invariant) — golden-tested in tests/test_extract.py.
    """
    return pages.select(
        "url", "lang", extract_text_col(F.col("html")).alias("text")
    )


def sentences(pages: DataFrame, target_langs: tuple[str, ...] = TARGET_LANGS) -> DataFrame:
    """One row per sentence: (url, lang, sent_idx, sentence).

    Non-target-lang pages are skipped, not failed (the reference's
    failOnError analog, TranslationManager.kt:347-351). Empty /
    whitespace pages yield zero rows (sentences_col filters empties).
    """
    txt = pages.filter(F.col("lang").isin(list(target_langs))).select(
        "url", "lang", extract_text_col(F.col("html")).alias("text")
    )
    return txt.select(
        "url",
        "lang",
        F.posexplode(sentences_col(F.col("text"))).alias("sent_idx", "sentence"),
    )


def mentions(sent_df: DataFrame) -> DataFrame:
    """Capitalized-run mention detection (1-3 Title Case words).

    The AST-node-emission analog (reference Handler framework,
    frontends/Handler.java). Pure per-row regexp — stays in codegen;
    tok_idx is the in-sentence occurrence index.
    """
    surf = sent_df.select(
        "url",
        "sent_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("sentence"), F.lit(MENTION_REGEX), 0)
        ).alias("tok_idx", "surface"),
    )
    return surf.select(
        "url",
        "sent_idx",
        F.col("tok_idx").cast("int").alias("tok_idx"),
        F.lower(F.col("surface")).alias("alias_norm"),
        "surface",
        F.size(F.split(F.col("surface"), " ")).cast("int").alias("n_words"),
    )
