"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and document fingerprinting — the building blocks a 100 TB text-corpus
pipeline runs before anything else. Everything is a pure Column
expression (whole-stage codegen, no Python in the hot path); each
operator has a DuckDB-oracle twin in cpg_spark/queries.py.

Reference lineage: these are the StringPropertyPass-style predicate scans
(reference cpg-analysis StringPropertyPass.kt:69-110 selects nodes by
FQN regex) and StatisticsCollectionPass counts (StatisticsCollectionPass
.kt:39-62) generalized to web text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import char_poly_hash_col

# token pattern shared with the DuckDB oracle (simple classes — identical
# semantics between Java regex and RE2)
DOC_TOKEN_RE = "[a-z0-9]+"

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic; order fixes the argmax tie-break (first wins)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein"),
    "es": ("el", "la", "los", "y", "de", "es", "un"),
    "fr": ("le", "la", "les", "et", "de", "est", "un"),
    "zh": ("de", "le", "shi", "zai", "he", "you", "wo"),
}


def doc_tokens(text: Column) -> Column:
    """array<string> lowercase tokens."""
    return F.regexp_extract_all(F.lower(text), F.lit(DOC_TOKEN_RE), 0)


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counting: totals, distinct, type-token ratio, mean
    token length. All exact or deterministic-per-row arithmetic."""
    toks = doc_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        # raw doubles on purpose: the per-row arithmetic is bit-identical
        # to the oracle's, while round() half-cases differ between engines
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
        (
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / F.size(toks)
        ).alias("mean_tok_len"),
    ).filter(F.col("n_tokens") > 0)


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword presence +
    lexical diversity. The closed formula matters less than that it is
    vectorized, deterministic, and oracle-checkable."""
    toks = doc_tokens(F.col("text"))
    en = list(LANG_STOPWORDS["en"])
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(en)))
    ttr = F.size(F.array_distinct(toks)) / n
    len_ok = (F.length("text") >= 100) & (F.length("text") <= 20000)
    score = (
        len_ok.cast("double") * 0.4
        + F.least(stop_hits / F.lit(5.0), F.lit(1.0)) * 0.3
        + F.least(ttr * 2, F.lit(1.0)) * 0.3
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_text"),
        stop_hits.alias("stop_hits"),
        score.alias("quality"),
    ).filter(n > 0)


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID: count per-language stopword occurrences,
    argmax with fixed precedence (dict order) on ties. Returns the score
    vector plus the prediction so the oracle checks the whole decision."""
    toks = doc_tokens(F.col("text"))

    # NB: never add default args to HOF lambdas — PySpark reads a 2-arg
    # lambda as (element, index) and binds the index to the default.
    def hits(words: tuple[str, ...]) -> Column:
        wl = list(words)
        return F.size(F.filter(toks, lambda tk: tk.isin(wl)))

    scores = {lang: hits(words) for lang, words in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lg] for lg in langs])
    pred = F.lit("und")
    # first language (dict order) achieving the max wins — build the CASE
    # back-to-front so earlier langs take precedence
    for lg in reversed(langs):
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    cols = [F.col("doc_id"), F.col("lang")]
    cols += [scores[lg].alias(f"score_{lg}") for lg in langs]
    cols += [pred.alias("pred_lang")]
    return docs.select(*cols)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Whole-document rolling-hash fingerprint (engine-portable polynomial
    hash over the normalized text) — the cheap exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        char_poly_hash_col(norm).alias("fp"),
        F.length("text").alias("n_chars_text"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k salient terms by tf·(N/df) — the corpus-level
    term-weighting a training-data pipeline uses for keyword tagging and
    topic-balanced sampling. Deliberately N/df, NOT log(N/df): the
    logarithm's last-ulp behavior is libm-dependent, while count
    arithmetic and one IEEE division are bit-reproducible across engines
    (the repo-wide oracle-exactness rule). Rankings per term are
    identical; cross-term weighting is linear instead of logarithmic.

    Shape: one LINEAR pipeline over the expensive tokenize+explode
    subtree — it runs exactly once, structurally (review finding: the
    original tf → {df groupBy, totals agg, join} fan-out recomputed it
    per consumer; Spark's exchange reuse did not kick in): (doc, term)
    counts → per-term df as a count over a term-partitioned window →
    broadcast 1-row corpus total (counted from the raw scan with a
    size() filter, no explode) → window top-k per doc. Three shuffles
    ((doc,term) agg, term window, doc top-k), no joins on the heavy
    side, no driver actions.
    """
    from pyspark.sql import Window

    from .sampling import top_k_per_group

    base = docs.select("doc_id", F.explode(doc_tokens(F.col("text"))).alias("term"))
    tf = base.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    totals = (
        docs.filter(F.size(doc_tokens(F.col("text"))) > 0)
        .agg(F.count_distinct("doc_id").alias("__n"))
    )
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("__n")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    return top_k_per_group(
        scored, ["doc_id"], "score", k, descending=True, tie_break="term"
    )


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher/MassiveText repetition-and-shape quality signals (Rae et
    al. 2021, "Scaling Language Models: ...", Table A1 — the public
    filter recipe most web-corpus pipelines start from), computed
    relationally per document:

      n_tokens            word count
      mean_word_len       mean token length
      frac_top_word       occurrences of the most frequent word / n
      top_2gram_frac      chars covered by the most frequent 2-gram /
                          total token chars (each occurrence counted)
      dup_5gram_char_frac chars in 5-grams that occur more than once /
                          total token chars
      gopher_pass         the conjunction of the published gates:
                          50 ≤ n ≤ 100000, 3 ≤ mean_word_len ≤ 10,
                          frac_top_word ≤ 0.2, top_2gram_frac ≤ 0.20,
                          dup_5gram_char_frac ≤ 0.15

    Scale shape: explode → count per (doc, gram) → combinable max/sum
    per doc — one shuffle keyed by doc_id-and-gram, partials combined
    map-side; no per-row O(n²) scans, no window, no Python. Every
    fraction is one division of exact integer counts (engine-parity
    safe). Empty documents come back with n_tokens=0, NULL signals and
    gopher_pass=false — unscorable, not silently passing."""
    toks = doc_tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("__t")).filter(F.size("__t") > 0)

    words = base.select("doc_id", F.explode("__t").alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    word_stats = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        (F.sum(F.col("c") * F.length("w")) / F.sum("c")).alias("mean_word_len"),
        (F.max("c") / F.sum("c")).alias("frac_top_word"),
        F.sum(F.col("c") * F.length("w")).cast("long").alias("__chars"),
    )

    def grams(n: int):
        # n-gram join with '\x01' (outside the token alphabet) so
        # gram char-length = length(gram) - (n-1) separators
        return base.filter(F.size("__t") >= n).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(__t) - {n - 1}), "
                    f"i -> array_join(slice(__t, i, {n}), '\x01'))"
                )
            ).alias("g"),
        )

    g2 = (
        grams(2)
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            # top 2-gram by (count desc, gram asc) — deterministic via
            # min(struct(-count, gram)); its covered chars =
            # occurrences x gram chars
            F.min(
                F.struct(
                    (-F.col("c")).alias("__nc"),
                    F.col("g").alias("g"),
                )
            ).alias("__top"),
        )
        .select(
            "doc_id",
            (-F.col("__top.__nc")).alias("__top2_cnt"),
            (F.length(F.col("__top.g")) - 1).alias("__top2_chars"),
        )
    )
    g5 = (
        grams(5)
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("doc_id", "c", (F.length("g") - 4).alias("__gc"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.col("__gc")).otherwise(0)
            )
            .cast("long")
            .alias("__dup5_chars")
        )
    )

    joined = (
        word_stats.join(g2, "doc_id", "left")
        .join(g5, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "mean_word_len",
            "frac_top_word",
            F.coalesce(
                F.col("__top2_cnt") * F.col("__top2_chars") / F.col("__chars"),
                F.lit(0.0),
            ).alias("top_2gram_frac"),
            F.coalesce(
                F.col("__dup5_chars") / F.col("__chars"), F.lit(0.0)
            ).alias("dup_5gram_char_frac"),
        )
    )
    gate = (
        F.col("n_tokens").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("frac_top_word") <= 0.2)
        & (F.col("top_2gram_frac") <= 0.20)
        & (F.col("dup_5gram_char_frac") <= 0.15)
    )
    scored = joined.withColumn("gopher_pass", gate)
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "mean_word_len",
            "frac_top_word",
            "top_2gram_frac",
            "dup_5gram_char_frac",
            F.coalesce("gopher_pass", F.lit(False)).alias("gopher_pass"),
        )
    )


OOV_TOKEN = "<unk>"  # outside DOC_TOKEN_RE's alphabet — can't collide


def lm_bigram_score(docs: DataFrame, max_vocab: int | None = None) -> DataFrame:
    """Corpus-trained word-bigram LM quality score — the CCNet-style
    LM-filter analog (score each document by how typical its word
    transitions are; sort/filter the corpus on it). Model and scoring in
    one job over the corpus:

      c(w1,w2)  bigram counts           — explode + combinable agg
      c(w1)     continuation denominator (= Σ_w2 c(w1,w2))
      V         distinct continuation vocabulary
      p(w2|w1)  = (c(w1,w2) + 1) / (c(w1) + V)   add-one smoothed

    score = MEAN transition likelihood over the doc's ordered bigrams,
    computed as a sequential fold over the position-sorted array.
    Deliberately rational and log-free (the tfidf_top_terms rule):
    count arithmetic + IEEE division + a sequential sum are
    bit-reproducible across engines, while ln()'s last ulp is
    libm-dependent; the ranking a filter needs is preserved. On a real
    cluster swap the mean for avg log-prob — no oracle parity needed
    there.

    Scale contract (the CCNet recipe): with `max_vocab` set, tokens
    outside the top-`max_vocab` by corpus occurrence count (ties to the
    lexicographically smaller token) fold into one OOV_TOKEN bucket
    BEFORE bigram construction, so the vocab map and the c(w1) table
    are provably ≤ max_vocab+1 rows — those two joins broadcast.
    c(w1,w2) is O(vocab²) worst-case and is NEVER broadcast-hinted at
    any setting: it shuffle-joins on (w1,w2), and AQE may still elect a
    broadcast when the observed table is small. With max_vocab=None
    (oracle-parity mode, small corpora) no table gets a forced hint.

    Returns (doc_id, n_bigrams, score); documents with <2 tokens carry
    n_bigrams=0 and score NULL (unscorable, not silently 0)."""
    toks = doc_tokens(F.col("text"))
    base = (
        docs.select("doc_id", toks.alias("__t"))
        # <2 tokens: no bigram (and sequence(1, 0) DESCENDS in Spark,
        # which would index out of bounds) — restored by the left join
        .filter(F.size("__t") >= 2)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1), "
                    "i -> struct(__t[i-1] AS w1, __t[i] AS w2))"
                )
            ).alias("pos", "bg"),
        )
        .select(
            "doc_id", "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
    )
    if max_vocab is not None:
        uni = (
            docs.select(F.explode(toks).alias("__tok"))
            .groupBy("__tok")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        # TakeOrderedAndProject over the vocab-sized count table —
        # deterministic (count desc, token asc), driver-small result
        vocab = (
            uni.orderBy(F.desc("__c"), F.asc("__tok"))
            .limit(max_vocab)
            .select("__tok", F.lit(True).alias("__in"))
        )
        for col in ("w1", "w2"):
            base = (
                base.join(
                    F.broadcast(vocab.withColumnRenamed("__tok", col)), col, "left"
                )
                .withColumn(
                    col, F.when(F.col("__in"), F.col(col)).otherwise(F.lit(OOV_TOKEN))
                )
                .drop("__in")
            )
    c12 = base.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = base.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = base.agg(F.count_distinct("w2").alias("__v"))
    c1_side = F.broadcast(c1) if max_vocab is not None else c1
    scored = (
        base.join(c12, ["w1", "w2"])
        .join(c1_side, "w1")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "__p",
            (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("__v")),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        (
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("__p")))
                    ),
                    lambda s: s.getField("__p"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("score"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "score",
        )
    )
