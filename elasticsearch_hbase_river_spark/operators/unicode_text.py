"""Unicode-mode text analysis queries (round-8: the multilingual analyzer
path the ascii guard made loud in round 7).

The reference decodes every cell through a configurable charset
(`HBaseRiver.java:74,151`) — i.e. its data model is "any Unicode string",
and only this engine's ANALYSIS surface was scoped to [a-z0-9]. These
queries exercise the ``unicode`` analyzer mode
(`functions/analyzer.py:analyze_tokens_unicode`: full lowercase →
final-sigma fold → split on ``[^\\p{L}\\p{M}\\p{Nd}]+``) end-to-end with
DuckDB oracle twins running the IDENTICAL chain, proving both engines
analyze multilingual text identically (the per-codepoint parity contract
lives in `tools/analyzer_parity_sweep.py`).

The driver fixtures are ASCII (by round-7's own guard), so each query
derives a deterministic multilingual corpus IN-PLAN, with the same
expression in both engines: accent-fold the vowels via ``translate`` and
append a per-doc language sentence chosen by ``doc_id % 4`` (German,
Greek — including capital final sigma, the contextual-casing case —
Russian, CJK + Arabic-Indic digits). Everything stays map-side column
algebra; the only shuffle is ``q_tokenize_unicode``'s token-frequency
aggregation, identical in shape to ``q_tokenize``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.analyzer import (
    analyze_tokens,
    analyze_tokens_unicode,
    analyze_toks_sql,
    analyze_toks_unicode_sql,
)
from elasticsearch_hbase_river_spark.sources.tables import load_table

#: Per-doc language sentences (doc_id % 4 picks one). Greek includes
#: ΟΔΥΣΣΕΥΣ — capital FINAL sigma position — so the ς→σ fold is load-
#: bearing in the gate, not decorative.
UNI_SENTENCES = (
    "Grüße aus München données déjà vu",
    "ελλάδα ΟΔΥΣΣΕΥΣ Αθήνα αθηνα",
    "Привет мир данные поиск",
    "東京タワー 日本語 ١٢٣ نص",
)

#: Vowel→accented-vowel fold applied to the ASCII fixture text, so the
#: BODY of every document is non-ASCII too (not just the suffix).
_TR_FROM, _TR_TO = "aeiou", "äéîöü"

#: Query terms for the unicode term search: accented body tokens (the
#: translate image of common fixture words) + one from each suffix class.
UNI_TERMS = ("thé", "dätä", "grüße", "données", "οδυσσευσ", "данные",
             "日本語")


def unicode_corpus_col() -> Column:
    """The derived multilingual text column (Spark side)."""
    suffix = (
        F.when(F.col("doc_id") % 4 == 0, UNI_SENTENCES[0])
         .when(F.col("doc_id") % 4 == 1, UNI_SENTENCES[1])
         .when(F.col("doc_id") % 4 == 2, UNI_SENTENCES[2])
         .otherwise(UNI_SENTENCES[3]))
    return F.concat_ws(
        " ", F.translate(F.col("text"), _TR_FROM, _TR_TO), suffix)


def unicode_corpus_sql() -> str:
    """The DuckDB twin of :func:`unicode_corpus_col` over ``documents``."""
    return (f"translate(text, '{_TR_FROM}', '{_TR_TO}') || ' ' || "
            f"CASE WHEN doc_id % 4 = 0 THEN '{UNI_SENTENCES[0]}' "
            f"WHEN doc_id % 4 = 1 THEN '{UNI_SENTENCES[1]}' "
            f"WHEN doc_id % 4 = 2 THEN '{UNI_SENTENCES[2]}' "
            f"ELSE '{UNI_SENTENCES[3]}' END")


def q_tokenize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency under the unicode analyzer — ``q_tokenize``'s
    shape (explode → partial-aggregated count, one high-cardinality
    no-skew shuffle) over the multilingual corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = analyze_tokens_unicode(unicode_corpus_col())
    return (docs.select(F.explode(toks).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def q_term_search_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term search with non-ASCII query terms over the multilingual
    corpus: (doc_id, token, tf) for every match. Map-side explode +
    IN-list filter before the (token, doc) aggregation — the filter
    prunes the explode output to query terms, so the shuffle carries
    only matching occurrences (the postings-build discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = analyze_tokens_unicode(unicode_corpus_col())
    return (docs.select("doc_id", F.explode(toks).alias("token"))
            .filter(F.col("token").isin(*UNI_TERMS))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))


def q_text_stats_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/distinct counts under BOTH analyzer modes over
    the same multilingual corpus — the observable gap the ascii guard
    protects against, quantified per doc (ascii mode shatters every
    accented token into fragments)."""
    docs = load_table(spark, sf_dir, "documents")
    uni = unicode_corpus_col()
    utoks = analyze_tokens_unicode(uni)
    atoks = analyze_tokens(uni)
    return docs.select(
        "doc_id",
        F.size(utoks).cast("long").alias("n_tokens_unicode"),
        F.size(F.array_distinct(utoks)).cast("long")
        .alias("n_distinct_unicode"),
        F.size(atoks).cast("long").alias("n_tokens_ascii"),
    )


_UTOKS = analyze_toks_unicode_sql("uni")
_ATOKS = analyze_toks_sql("uni")
_TERMS_SQL = ", ".join(f"'{t}'" for t in UNI_TERMS)

QUERIES = {
    "q_tokenize_unicode": q_tokenize_unicode,
    "q_term_search_unicode": q_term_search_unicode,
    "q_text_stats_unicode": q_text_stats_unicode,
}

ORACLES = {
    "q_tokenize_unicode": f"""
WITH uni AS (SELECT doc_id, {unicode_corpus_sql()} AS uni FROM documents)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest({_UTOKS}) AS token FROM uni)
GROUP BY token""",
    "q_term_search_unicode": f"""
WITH uni AS (SELECT doc_id, {unicode_corpus_sql()} AS uni FROM documents)
SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
FROM (SELECT doc_id, unnest({_UTOKS}) AS token FROM uni)
WHERE token IN ({_TERMS_SQL})
GROUP BY doc_id, token""",
    "q_text_stats_unicode": f"""
WITH uni AS (SELECT doc_id, {unicode_corpus_sql()} AS uni FROM documents)
SELECT doc_id,
       CAST(len({_UTOKS}) AS BIGINT) AS n_tokens_unicode,
       CAST(len(list_distinct({_UTOKS})) AS BIGINT) AS n_distinct_unicode,
       CAST(len({_ATOKS}) AS BIGINT) AS n_tokens_ascii
FROM uni""",
}
