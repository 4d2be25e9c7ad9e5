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

from elasticsearch_hbase_river_spark.functions.determinism import roundn_sql
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


#: BM25 query terms for the unicode search: two accent-folded body tokens
#: (the translate image of common fixture words) whose df varies per doc.
UNI_BM25_TERMS = ("dätä", "wîndöw")
UNI_BM25_TOP = 20
_K1, _B = 1.2, 0.75


def q_bm25_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked top-{UNI_BM25_TOP} for accented query terms over the
    multilingual corpus — the full relevance pipeline (tf, df, dl, N,
    avgdl) under the unicode analyzer, in a JOIN-FREE shape: the query
    has a FIXED handful of terms, so per-doc tf comes from map-side
    array counts on the one tokenization pass (no explode, no
    (doc, token) shuffle, no dl sort-merge join — the join form's SMJ
    peak OOM'd a 1 GB session at the 100x fixture under accumulated
    block pressure; this shape's only non-map stages are the 1-row
    stats aggregate and the top-k). df/N/avgdl broadcast from that
    single row; everything else is whole-stage codegen.

    r12: the per-doc row relation feeds BOTH the stats aggregate and the
    scoring pass — two full unicode tokenizations of the corpus, each in
    the fixture's one scan task. Fan the scan out (scale-adaptive) and
    persist the row relation: it is doc_id + three longs (~32 bytes/doc
    at ANY corpus size — the narrow-proxy class of guide §8), so the
    tokenize runs once and the second pass reads integers."""
    from elasticsearch_hbase_river_spark.functions.determinism import (
        roundn_col,
    )
    from pyspark import StorageLevel
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    toks = analyze_tokens_unicode(unicode_corpus_col())
    tf_cols = [
        F.size(F.filter("toks", lambda t: t == F.lit(term)))
        .cast("long").alias(f"tf{i}")
        for i, term in enumerate(UNI_BM25_TERMS)]
    row = docs.select(
        "doc_id", toks.alias("toks")
    ).select("doc_id", F.size("toks").cast("long").alias("dl"), *tf_cols) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    stats = row.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).cast("long")
          .alias(f"df{i}") for i in range(len(UNI_BM25_TERMS))])

    def contrib(i: int):
        idf = F.log(F.lit(1.0)
                    + (F.col("n_docs") - F.col(f"df{i}") + 0.5)
                    / (F.col(f"df{i}") + 0.5))
        tf = F.col(f"tf{i}")
        tf_norm = (tf * (_K1 + 1)) / (
            tf + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
        return F.when(tf > 0, idf * tf_norm).otherwise(F.lit(0.0))

    score = roundn_col(sum(contrib(i)
                           for i in range(len(UNI_BM25_TERMS))))
    per_doc = (row.crossJoin(F.broadcast(stats))
               .filter(sum(F.col(f"tf{i}")
                           for i in range(len(UNI_BM25_TERMS))) > 0)
               .select("doc_id", score.alias("score")))
    top = (per_doc.orderBy(F.col("score").desc(), F.col("doc_id"))
           .limit(UNI_BM25_TOP))
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


_UTOKS = analyze_toks_unicode_sql("uni")
_ATOKS = analyze_toks_sql("uni")
_TERMS_SQL = ", ".join(f"'{t}'" for t in UNI_TERMS)
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in UNI_BM25_TERMS)

QUERIES = {
    "q_tokenize_unicode": q_tokenize_unicode,
    "q_term_search_unicode": q_term_search_unicode,
    "q_text_stats_unicode": q_text_stats_unicode,
    "q_bm25_unicode": q_bm25_unicode,
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
    "q_bm25_unicode": f"""
WITH uni AS (SELECT doc_id, {unicode_corpus_sql()} AS uni FROM documents),
tok AS (
  SELECT doc_id, unnest({_UTOKS}) AS token FROM uni),
dl AS (SELECT doc_id, CAST(len({_UTOKS}) AS BIGINT) AS dl FROM uni),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 avg(len({_UTOKS})) AS avgdl FROM uni),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (stats.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
         * (tf.tf * ({_K1} + 1)) /
           (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dfr USING (token) JOIN dl USING (doc_id), stats),
scored AS (
  SELECT doc_id, {roundn_sql('sum(c)')} AS score FROM contrib GROUP BY doc_id),
ranked AS (
  SELECT doc_id, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
  FROM scored)
SELECT * FROM ranked WHERE rank <= {UNI_BM25_TOP}""",
}
