"""Training-data curation observability (extension surface, SURVEY.md
§2.3 / BASELINE.json north star): the report-card queries a 100 TB
pretraining pipeline runs BESIDE the filters themselves — published
Gopher-style quality gates per document, corpus health by source, and
the deterministic sliced-export primitive.

- ``q_gopher_rules``      : the published Gopher repetition-free quality
  thresholds (Rae et al. 2021, §A1.1) evaluated per document: word
  count in [{GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS}], mean word length
  in [{GOPHER_MIN_MWL}, {GOPHER_MAX_MWL}], ≥ {GOPHER_ALPHA_FRAC:.0%}
  of words containing an alphabetic character, and ≥ {GOPHER_MIN_STOP}
  stop words present. Complements ``q_quality_score`` (a composite
  score) with the hard published gates.
- ``q_corpus_report``     : per (source, lang) corpus health — document
  count, mean token count, mean stopword ratio. The group-by relation
  is |sources|×|langs|-sized.
- ``q_dup_rate_by_source``: exact-duplicate rate per source (1 −
  distinct content hashes / docs) — the observability twin of
  ``q_exact_dedup``, which removes the dups this measures.
- ``q_sliced_scroll``     : ES sliced-scroll export: every document is
  deterministically assigned to one of {N_SLICES} slices by content
  hash of its id (ES's ``slice`` API hashes ``_id`` the same way);
  per-slice doc counts and id ranges prove the slices partition the
  corpus.

Scale shapes: everything here is map-side column algebra followed by
ONE partial-aggregated shuffle onto a tiny group relation (doc rows for
``q_gopher_rules`` — a filter, not an agg). The dup-rate distinct rides
a (source, hash)-keyed partial aggregate; no sorts, no windows, no
collects. All ratios are rounded with the portable
``floor(x*1eN+0.5)/1eN`` (`functions/determinism.py`); means accumulate
as BIGINT/DECIMAL before one double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import (
    roundn_col,
    roundn_sql,
)
from elasticsearch_hbase_river_spark.operators.curation import _bucket
from elasticsearch_hbase_river_spark.operators.text import (
    STOPWORDS,
    _count_in,
    _sql_count_in,
    _toks,
)
from elasticsearch_hbase_river_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# Published Gopher quality-filter thresholds (Rae et al. 2021, §A1.1).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_ALPHA_FRAC = 0.80
GOPHER_MIN_STOP = 2

N_SLICES = 8


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality gates per document (thresholds above): the four
    rule verdicts plus the conjunction. Pure map-side column algebra —
    split once, fold counts with higher-order functions, zero UDFs,
    zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t).cast("long"))
    mwl = sum_len.cast("double") / n_words
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    n_stop = _count_in(toks, STOPWORDS)
    ok_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ok_mwl = (mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)
    ok_alpha = n_alpha >= GOPHER_ALPHA_FRAC * n_words
    ok_stop = n_stop >= GOPHER_MIN_STOP
    return docs.select(
        "doc_id", n_words.alias("n_words"),
        roundn_col(mwl).alias("mean_word_len"),
        n_alpha.alias("n_alpha_words"), n_stop.alias("n_stopwords"),
        ok_words.alias("ok_word_count"), ok_mwl.alias("ok_mean_len"),
        ok_alpha.alias("ok_alpha_frac"), ok_stop.alias("ok_stopwords"),
        (ok_words & ok_mwl & ok_alpha & ok_stop).alias("passes"))


_W = "string_split(text, ' ')"
_SUM_LEN = f"list_sum(list_transform({_W}, t -> length(t)))"
_N_ALPHA = f"len(list_filter({_W}, t -> regexp_matches(t, '[a-z]')))"

ORACLES["q_gopher_rules"] = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len({_W}) AS BIGINT) AS n_words,
         CAST({_SUM_LEN} AS DOUBLE) / len({_W}) AS mwl,
         CAST({_N_ALPHA} AS BIGINT) AS n_alpha_words,
         {_sql_count_in(STOPWORDS)} AS n_stopwords
  FROM documents)
SELECT doc_id, n_words, {roundn_sql('mwl')} AS mean_word_len,
       n_alpha_words, n_stopwords,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
         AS ok_word_count,
       (mwl >= {GOPHER_MIN_MWL} AND mwl <= {GOPHER_MAX_MWL}) AS ok_mean_len,
       (n_alpha_words >= {GOPHER_ALPHA_FRAC} * n_words) AS ok_alpha_frac,
       (n_stopwords >= {GOPHER_MIN_STOP}) AS ok_stopwords,
       ((n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
        AND (mwl >= {GOPHER_MIN_MWL} AND mwl <= {GOPHER_MAX_MWL})
        AND (n_alpha_words >= {GOPHER_ALPHA_FRAC} * n_words)
        AND (n_stopwords >= {GOPHER_MIN_STOP})) AS passes
FROM d"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus report card per (source, lang): document count, mean
    token count, mean stopword ratio — the health dashboard a curation
    run emits per ingest source. One partial-agg shuffle onto the
    |sources|×|langs| relation; token counts accumulate as BIGINT, the
    per-doc stopword ratios as DECIMAL of their 6-dp snap."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks).cast("long")
    stop_ratio = roundn_col(
        _count_in(toks, STOPWORDS).cast("double") / n_tokens)
    per = docs.select("source", "lang", n_tokens.alias("nt"),
                      stop_ratio.cast("decimal(18,6)").alias("sr"))
    return (per.groupBy("source", "lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 roundn_col(F.sum("nt").cast("double")
                            / F.count(F.lit(1))).alias("avg_tokens"),
                 roundn_col(F.sum("sr").cast("double")
                            / F.count(F.lit(1))).alias("avg_stop_ratio")))


ORACLES["q_corpus_report"] = f"""
WITH per AS (
  SELECT source, lang,
         CAST(len({_W}) AS BIGINT) AS nt,
         CAST({roundn_sql(
             f"CAST({_sql_count_in(STOPWORDS)} AS DOUBLE) / len({_W})")}
              AS DECIMAL(18,6)) AS sr
  FROM documents)
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       {roundn_sql('CAST(sum(nt) AS DOUBLE) / count(*)')} AS avg_tokens,
       {roundn_sql('CAST(sum(sr) AS DOUBLE) / count(*)')} AS avg_stop_ratio
FROM per GROUP BY source, lang"""


def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per ingest source: 1 − distinct content
    hashes / documents — what a curation dashboard tracks per feed to
    catch a source that started re-sending content. The distinct is a
    (source, hash)-keyed partial aggregate (the same md5 the dedup
    family keys on); no row leaves its aggregation path."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select("source", F.md5(F.col("text")).alias("h"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.countDistinct("h").cast("long").alias("n_unique"))
            .select("source", "n_docs", "n_unique",
                    roundn_col(F.lit(1.0) - F.col("n_unique").cast("double")
                               / F.col("n_docs")).alias("dup_rate")))


ORACLES["q_dup_rate_by_source"] = f"""
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       {roundn_sql('1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)'
                   ' / count(*)')} AS dup_rate
FROM documents GROUP BY source"""


def q_sliced_scroll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sliced scroll: deterministic slice assignment by content hash
    of the document id (slice = md5-bucket / {256 // N_SLICES}, ES's
    ``slice`` API semantics), with per-slice doc counts, id ranges and
    byte totals — the primitive that lets {N_SLICES} independent
    consumers export one index in parallel. Assignment is map-side;
    one |slices|-group shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    slice_id = (_bucket("doc_id") / (256 // N_SLICES)).cast("long")
    return (docs.groupBy(slice_id.alias("slice_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id"),
                 F.sum("n_chars").cast("long").alias("total_chars")))


_HEX = "0123456789abcdef"
_BUCKET_SQL = (
    f"((strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"
    f" * 16"
    f" + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))")

ORACLES["q_sliced_scroll"] = f"""
SELECT CAST({_BUCKET_SQL} // {256 // N_SLICES} AS BIGINT) AS slice_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1"""

# ---------------------------------------------------------------------------
# _field_caps — the mapping-discovery API (what Kibana calls before every
# query UI render): per dynamic field, how many documents carry it and the
# narrowest type every observed value satisfies.

_INT_RE = "^-?[0-9]+$"
_NUM_RE = "^-?[0-9]+(\\.[0-9]+)?$"


def q_field_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_field_caps`` over the river's dynamic fields: the melted
    cells relation IS the mapping (`HBaseParser.java:204-216` — whatever
    cells exist become fields), so capabilities are a single grouped
    aggregate per ``family.qualifier``: document count, value count, and
    the narrowest type (``long`` ⊂ ``double`` ⊂ ``keyword``) every
    non-null observed value parses as — the same dynamic-typing decision
    ES's mapper makes per field.

    Scale shape: TWO-LEVEL aggregation — (field, row_key) first, then
    field — instead of ``count_distinct``: the distinct rewrite's Expand
    doubles the melted relation and OOM'd a default 1 GB heap at sf10
    (40M cells), while the explicit pre-aggregation partial-aggs
    map-side and shuffles each (field, key) pair once. The type lattice
    is two map-side regex flags aggregated with ``min`` (all-castable ⇔
    min = 1). Fields are |families|×|qualifiers|-sized, never
    corpus-sized."""
    from elasticsearch_hbase_river_spark.sources.cells import (
        cells_from_events,
    )

    cells = cells_from_events(spark, sf_dir)
    # null values count as non-castable (matching the oracle's CASE,
    # where a null regexp_matches falls to the ELSE 0 branch)
    is_int = F.coalesce(F.col("value").rlike(_INT_RE).cast("int"), F.lit(0))
    is_num = F.coalesce(F.col("value").rlike(_NUM_RE).cast("int"), F.lit(0))
    per_doc = (cells
               .select(F.concat_ws(".", "family", "qualifier")
                       .alias("field"),
                       "row_key", is_int.alias("i"), is_num.alias("n"))
               .groupBy("field", "row_key")
               .agg(F.count(F.lit(1)).cast("long").alias("nvals"),
                    F.min("i").alias("i"), F.min("n").alias("n")))
    per = (per_doc.groupBy("field")
           .agg(F.count(F.lit(1)).cast("long").alias("doc_count"),
                F.sum("nvals").cast("long").alias("value_count"),
                F.min("i").alias("all_int"), F.min("n").alias("all_num")))
    ftype = (F.when(F.col("all_int") == 1, "long")
             .when(F.col("all_num") == 1, "double")
             .otherwise("keyword"))
    return (per.select("field", ftype.alias("type"), "doc_count",
                       "value_count",
                       (ftype != "keyword").alias("aggregatable"))
            .orderBy("field"))


from elasticsearch_hbase_river_spark.sources.cells import CELLS_CTE  # noqa: E402

ORACLES["q_field_caps"] = f"""
{CELLS_CTE},
per AS (
  SELECT family || '.' || qualifier AS field,
         CAST(count(DISTINCT row_key) AS BIGINT) AS doc_count,
         CAST(count(*) AS BIGINT) AS value_count,
         min(CASE WHEN regexp_matches(value, '{_INT_RE}')
                  THEN 1 ELSE 0 END) AS all_int,
         min(CASE WHEN regexp_matches(value, '{_NUM_RE}')
                  THEN 1 ELSE 0 END) AS all_num
  FROM cells GROUP BY 1)
SELECT field,
       CASE WHEN all_int = 1 THEN 'long'
            WHEN all_num = 1 THEN 'double'
            ELSE 'keyword' END AS type,
       doc_count, value_count,
       (CASE WHEN all_int = 1 THEN 'long'
             WHEN all_num = 1 THEN 'double'
             ELSE 'keyword' END <> 'keyword') AS aggregatable
FROM per ORDER BY field"""

# ---------------------------------------------------------------------------

QUERIES.update({
    "q_gopher_rules": q_gopher_rules,
    "q_corpus_report": q_corpus_report,
    "q_dup_rate_by_source": q_dup_rate_by_source,
    "q_sliced_scroll": q_sliced_scroll,
    "q_field_caps": q_field_caps,
})
