"""Text-analysis operators over document tables (SURVEY.md C5-C8).

The reference ships Spark NLP jars for this surface (resources/spark.py:67,
databricks.py:76-78) but exercises none of it in-repo; here the equivalent
capabilities are native Spark SQL expressions (JVM-side, codegen-friendly),
which both scales better than per-row NLP UDFs and stays DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ascii_hydra_spark.functions import (
    LANG_MARKERS,
    bpe_ish_tokens,
    lang_marker_score,
    md5_fingerprint,
    ngrams,
    quality_score,
    rolling_fingerprint,
    token_count,
    word_tokens,
)


def text_stats(docs: DataFrame, text_col: str = "text", by: str | None = "lang") -> DataFrame:
    """Per-group document statistics: doc count, avg chars, avg tokens."""
    base = docs.withColumn("__chars", F.length(text_col)).withColumn(
        "__toks", token_count(text_col)
    )
    keys = [by] if by else []
    return base.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("__chars"), 6).alias("avg_chars"),
        F.round(F.avg("__toks"), 6).alias("avg_tokens"),
    )


def term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf): per-document term counts via explode + count."""
    return (
        docs.select(F.col(id_col), F.explode(word_tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def document_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(term, df): number of documents containing each term."""
    return (
        docs.select(F.col(id_col), F.explode(word_tokens(text_col)).alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def ngram_counts(
    docs: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """(ngram, cnt): corpus-wide word n-gram counts."""
    return (
        docs.select(F.explode(ngrams(word_tokens(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counts: whitespace tokens and BPE-ish subword tokens."""
    return docs.select(
        F.col(id_col),
        token_count(text_col).alias("ws_tokens"),
        F.size(bpe_ish_tokens(text_col)).alias("bpe_tokens"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-marker language identification (deterministic heuristic).

    Scores each language by marker-stopword hits over the token stream and
    picks the argmax; ties and zero-hit docs resolve to 'und'. Expressible in
    ANSI SQL (the oracle replicates it), unlike model-based lang-ID.
    """
    toks = word_tokens(text_col)
    scored = docs.select(
        F.col(id_col),
        *[lang_marker_score(toks, lang).alias(f"__s_{lang}") for lang in LANG_MARKERS],
    )
    # argmax with deterministic tie-break: highest score, then lexicographic lang
    pairs = F.array(
        *[
            F.struct(F.col(f"__s_{lang}").alias("s"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["s"] > 0))
    # array_max on struct compares field-by-field: max score, then max lang;
    # to get lexicographic-min lang on ties we negate via sort_array desc+first
    ordered = F.sort_array(F.filter(pairs, lambda p: p["s"] > 0), asc=False)
    pred = F.when(F.size(ordered) == 0, F.lit("und")).otherwise(
        _first_best(ordered)
    )
    return scored.select(F.col(id_col), pred.alias("pred_lang"))


def _first_best(ordered):
    """ordered is sorted desc by (score, lang); take all with max score and
    return the lexicographically smallest lang among them."""
    top_score = ordered[0]["s"]
    best_langs = F.transform(
        F.filter(ordered, lambda p: p["s"] == top_score), lambda p: p["lang"]
    )
    return F.array_min(best_langs)


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc deterministic quality score in [0,1] (see functions.quality_score)."""
    return docs.select(F.col(id_col), F.round(quality_score(text_col), 6).alias("quality"))


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc content fingerprints: md5 hex + polynomial rolling hash."""
    return docs.select(
        F.col(id_col),
        md5_fingerprint(text_col).alias("md5_fp"),
        rolling_fingerprint(text_col).alias("poly_fp"),
    )


def regex_filter(docs: DataFrame, pattern: str, text_col: str = "text") -> DataFrame:
    """rlike predicate filter (pushed into the scan where possible)."""
    return docs.filter(F.col(text_col).rlike(pattern))
