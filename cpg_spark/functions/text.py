"""Text extraction / segmentation primitives.

EXTRACTION_VERSION pins the byte-identical contract: the same html bytes
must always yield the same text bytes (BASELINE.json per-row invariant).
Everything here is a pure Column expression (whole-stage codegen'd on the
JVM) — the frontend-parse analog of the reference
(cpg CXXLanguageFrontend.kt:196 etc.) without any per-row Python.

Two implementations are provided and golden-tested to be byte-identical:
  * extract_text_col      — Column expressions (the hot path)
  * extract_text_py       — pure-Python reference (used by the synthetic
                            generator's golden fixtures and by the
                            pandas-UDF variant extract_text_pandas)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

EXTRACTION_VERSION = "1"

# html escaping used by the page template (synth.py) — standard minimal set
_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]

# sentence boundary: split after ./!/? followed by whitespace
SENT_SPLIT_REGEX = r"(?<=[.!?])\s+"

# token: word characters incl. apostrophes/hyphens inside words
TOKEN_REGEX = r"[A-Za-z0-9][A-Za-z0-9'\-]*"


def escape_html_py(text: str) -> str:
    for raw, esc in _ESCAPES:
        text = text.replace(raw, esc)
    return text


def unescape_html_py(text: str) -> str:
    for raw, esc in reversed(_ESCAPES):
        text = text.replace(esc, raw)
    return text


# --- pure-Python reference extraction (golden-fixture side) ---------------

_ARTICLE_RE = re.compile(r"<article>(.*)</article>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text_py(html: bytes) -> str:
    """Reference extraction: article body -> strip tags -> unescape.

    Byte-identical inverse of synth.page_html for any input text (the
    template escapes all '<' '>' '&', so no tag-like bytes survive into
    the body).
    """
    s = html.decode("utf-8")
    m = _ARTICLE_RE.search(s)
    body = m.group(1) if m else ""
    body = _TAG_RE.sub("", body)
    return unescape_html_py(body)


def extract_text_pandas(html: pd.Series) -> pd.Series:
    """Vectorized pandas variant (Arrow batch path) of extract_text_py."""
    s = html.apply(lambda b: b.decode("utf-8") if b is not None else "")
    body = s.str.extract(r"(?s)<article>(.*)</article>", expand=False).fillna("")
    body = body.str.replace(r"<[^>]*>", "", regex=True)
    for raw, esc in reversed(_ESCAPES):
        body = body.str.replace(esc, raw, regex=False)
    return body


# --- Column-expression extraction (the hot path) ---------------------------


def extract_text_col(html: Column) -> Column:
    """JVM-side extraction, byte-identical to extract_text_py.

    decode -> regexp_extract article body ((?s) dotall) -> strip tags ->
    unescape entities. All whole-stage-codegen expressions.
    """
    s = F.decode(html, "UTF-8")
    body = F.regexp_extract(s, r"(?s)<article>(.*)</article>", 1)
    body = F.regexp_replace(body, r"<[^>]*>", "")
    body = F.replace(body, F.lit("&lt;"), F.lit("<"))
    body = F.replace(body, F.lit("&gt;"), F.lit(">"))
    body = F.replace(body, F.lit("&amp;"), F.lit("&"))
    return body


# --- markdown frontend (second per-format parser) ---------------------------
#
# The reference registers one frontend per language (Language.kt) and the
# compilation database supplies per-file parse config; here the per-row
# content_type column selects the frontend. Markdown extraction: drop
# heading/emphasis/code markers, collapse links to their text.

_MD_LINK_RE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_MD_HEAD_RE = re.compile(r"(?m)^#{1,6}[ \t]+")
_MD_MARK_RE = re.compile(r"[*_`]+")


def extract_text_md_py(raw: bytes) -> str:
    """Markdown reference extraction (python twin for golden fixtures)."""
    s = raw.decode("utf-8")
    s = _MD_LINK_RE.sub(r"\1", s)
    s = _MD_HEAD_RE.sub("", s)
    s = _MD_MARK_RE.sub("", s)
    return s


def extract_text_md_col(raw: Column) -> Column:
    """JVM-side markdown extraction, byte-identical to extract_text_md_py."""
    s = F.decode(raw, "UTF-8")
    s = F.regexp_replace(s, r"\[([^\]]*)\]\([^)]*\)", r"$1")
    s = F.regexp_replace(s, r"(?m)^#{1,6}[ \t]+", "")
    s = F.regexp_replace(s, r"[*_`]+", "")
    return s


def extract_text_dispatch(raw: Column, content_type: Column) -> Column:
    """Per-row frontend dispatch — the Language-registry + per-file
    compilation-db-config analog (reference Language.kt frontend lookup;
    the compilation database carries per-file parse flags, here a
    content_type column on every page row). One F.when chain, all
    branches codegen'd in the same pass: dispatch adds no shuffle and no
    second scan. Unknown types fall back to plain decode (skip-don't-fail,
    TranslationManager.kt:347-351)."""
    return (
        F.when(content_type == "text/html", extract_text_col(raw))
        .when(content_type == "text/markdown", extract_text_md_col(raw))
        .otherwise(F.decode(raw, "UTF-8"))
    )


# --- JSON-LD structured-data frontend (third per-format parser) -------------
#
# Common-Crawl pages carry schema.org structured data in
# <script type="application/ld+json"> blocks — for KG construction this
# is the highest-precision source on the page (typed entities the
# publisher asserted, no NER needed). The reference analog is another
# registered language frontend (Language.kt): same page row, different
# grammar.

JSONLD_BLOCK_REGEX = r'(?s)<script type="application/ld\+json">(.*?)</script>'


def jsonld_blocks_col(html: Column) -> Column:
    """array<string> of raw JSON-LD block bodies embedded in the page —
    one regexp pass, codegen'd; non-ld <script> tags don't match."""
    return F.regexp_extract_all(
        F.decode(html, "UTF-8"), F.lit(JSONLD_BLOCK_REGEX), 1
    )


def sentences_col(text: Column) -> Column:
    """array<string> of sentences (empty strings filtered out)."""
    return F.filter(
        F.split(F.trim(text), SENT_SPLIT_REGEX), lambda s: F.length(s) > 0
    )


def split_sentences_py(text: str) -> list[str]:
    return [s for s in re.split(SENT_SPLIT_REGEX, text.strip()) if s]


def tokens_col(sentence: Column) -> Column:
    """array<string> of normalized (lowercased) word tokens."""
    return F.regexp_extract_all(F.lower(sentence), F.lit(TOKEN_REGEX), 0)


def tokenize_py(sentence: str) -> list[str]:
    return re.findall(TOKEN_REGEX, sentence.lower())
