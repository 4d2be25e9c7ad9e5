"""ES query-DSL pack 7: sibling pipeline aggs, the normalize pipeline
agg, the remaining span variants, and runtime fields.

Packs 1-6 close the term/full-text, bucket/metric/pipeline, span,
suggest, geo/ip, structure-agg and multi-search families. This pack
picks up the last published shapes:

- ``q_sibling_bucket_stats`` : ES ``max_bucket`` / ``min_bucket`` /
  ``avg_bucket`` sibling pipeline aggs over a per-day date_histogram —
  which bucket holds the extreme and its value, plus the mean across
  buckets (ties resolved to the earliest day, deterministically).
- ``q_normalize_agg``        : ES ``normalize`` pipeline agg, method
  ``percent_of_sum`` — each bucket's share of the total.
- ``q_span_or``              : ES ``span_or`` — union of two term
  spans, per-doc occurrence count and distinct matched terms.
- ``q_span_within``          : ES ``span_within`` — the LITTLE span's
  matches confined inside a big (ordered two-term near) span; the dual
  of ``q_span_containing``, returning the little side.
- ``q_runtime_fields``       : ES runtime mappings — fields computed at
  QUERY time from stored ones (a value tier and an hour-of-day), then
  aggregated as if mapped. Schema-on-read: pure map-side expressions
  feeding one partial-agg shuffle.

Scale shapes: the pipeline aggs window/aggregate over the BUCKET
relation (days — thousands of rows at 100 TB; the corpus pays one keyed
partial-agg shuffle below). Span joins are single-term position lists
with term filters below the join. Runtime fields are free-riding
column algebra on the scan. Float outputs go through the portable
``floor(x*1eN+0.5)/1eN`` rounding (`functions/determinism.py`); sums
feeding them accumulate as BIGINT/DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import (
    roundn_col,
    roundn_sql,
)
from elasticsearch_hbase_river_spark.operators.esagg import DAY_MS
from elasticsearch_hbase_river_spark.operators.rollup import HOUR_MS
from elasticsearch_hbase_river_spark.operators.search import (
    _POSTINGS_SQL,
    _postings,
)
from elasticsearch_hbase_river_spark.sources.tables import (
    load_events,
    load_table,
)

QUERIES: dict = {}
ORACLES: dict = {}

# ---------------------------------------------------------------------------
# Sibling pipeline aggs — max_bucket / min_bucket / avg_bucket.

SIB_TYPE = "purchase"


def q_sibling_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sibling pipeline aggs over the per-day {SIB_TYPE!r} histogram:
    ``max_bucket`` / ``min_bucket`` (bucket key + value, ties to the
    earliest day — ES reports all tied keys; the deterministic twin
    picks the first) and ``avg_bucket``. The corpus pays ONE keyed
    partial-agg shuffle; the sibling scan is a 1-row aggregate over the
    day relation joined back to find the extreme keys."""
    ev = (load_events(spark, sf_dir)
          .filter(F.col("event_type") == SIB_TYPE))
    day = F.expr(f"ts_ms div {DAY_MS}")
    buckets = ev.groupBy(day.alias("day_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    stats = buckets.agg(
        F.max("n").alias("mx"), F.min("n").alias("mn"),
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("nb"))
    keyed = (buckets.join(F.broadcast(stats))
             .agg(F.min(F.when(F.col("n") == F.col("mx"),
                               F.col("day_id"))).alias("max_day"),
                  F.min(F.when(F.col("n") == F.col("mn"),
                               F.col("day_id"))).alias("min_day"),
                  F.max("mx").alias("max_count"),
                  F.max("mn").alias("min_count"),
                  roundn_col(F.max(F.col("total")).cast("double")
                             / F.max("nb")).alias("avg_count")))
    return keyed.select("max_day", "max_count", "min_day", "min_count",
                        "avg_count")


ORACLES["q_sibling_bucket_stats"] = f"""
WITH buckets AS (
  SELECT epoch_ms(ts) // {DAY_MS} AS day_id,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = '{SIB_TYPE}' GROUP BY 1),
stats AS (
  SELECT max(n) AS mx, min(n) AS mn, sum(n) AS total, count(*) AS nb
  FROM buckets)
SELECT min(CASE WHEN n = mx THEN day_id END) AS max_day,
       CAST(max(mx) AS BIGINT) AS max_count,
       min(CASE WHEN n = mn THEN day_id END) AS min_day,
       CAST(max(mn) AS BIGINT) AS min_count,
       {roundn_sql('CAST(max(total) AS DOUBLE) / max(nb)')} AS avg_count
FROM buckets CROSS JOIN stats"""

# ---------------------------------------------------------------------------
# normalize pipeline agg — percent_of_sum.

def q_normalize_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``normalize`` pipeline agg (method ``percent_of_sum``): each
    event type's share of all events. One conditional partial-agg
    shuffle onto the |types| relation; the total is a 1-row broadcast
    over that same relation (never the corpus)."""
    ev = load_events(spark, sf_dir)
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    total = per.agg(F.sum("n").alias("total"))
    return (per.join(F.broadcast(total))
            .select("event_type", "n",
                    roundn_col(F.col("n").cast("double") / F.col("total"))
                    .alias("pct_of_sum")))


ORACLES["q_normalize_agg"] = f"""
WITH per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type),
total AS (SELECT sum(n) AS total FROM per)
SELECT event_type, n,
       {roundn_sql('CAST(n AS DOUBLE) / total')} AS pct_of_sum
FROM per CROSS JOIN total"""

# ---------------------------------------------------------------------------
# span_or / span_within.

SPAN_OR_TERMS = ("dup", "vector")
SW_BIG = ("group", "sort", 6)   # ordered near: first, second, max gap
SW_LITTLE = "value"


def q_span_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``span_or``: the union of the {SPAN_OR_TERMS!r} term spans —
    per matching doc, total occurrences, distinct clauses matched, and
    the earliest position. The two-term filter is map-side below the
    per-doc aggregation."""
    p = _postings(load_table(spark, sf_dir, "documents"))
    hits = p.filter(F.col("token").isin(*SPAN_OR_TERMS))
    return (hits.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.countDistinct("token").cast("long").alias("n_clauses"),
                 F.min("pos").alias("first_pos")))


_SO_TERMS_SQL = ", ".join(f"'{t}'" for t in SPAN_OR_TERMS)

ORACLES["q_span_or"] = f"""
WITH tok AS ({_POSTINGS_SQL})
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT token) AS BIGINT) AS n_clauses,
       min(pos) AS first_pos
FROM tok WHERE token IN ({_SO_TERMS_SQL})
GROUP BY doc_id"""


def q_span_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``span_within``: occurrences of {SW_LITTLE!r} strictly inside
    a big span ({SW_BIG[0]!r} … {SW_BIG[1]!r}, ordered, ≤ {SW_BIG[2]}
    between) — the dual of ``q_span_containing``: this returns the
    LITTLE side's matches. All sides are single-term position lists;
    the little positions are deduped before counting (one little match
    may sit inside several big spans but is one span_within hit)."""
    p = _postings(load_table(spark, sf_dir, "documents"))
    g = (p.filter(F.col("token") == SW_BIG[0])
         .select("doc_id", F.col("pos").alias("pos_g")))
    s = (p.filter(F.col("token") == SW_BIG[1])
         .select("doc_id", F.col("pos").alias("pos_s")))
    v = (p.filter(F.col("token") == SW_LITTLE)
         .select("doc_id", F.col("pos").alias("pos_v")))
    spans = (g.join(s, "doc_id")
             .filter((F.col("pos_s") > F.col("pos_g"))
                     & (F.col("pos_s") - F.col("pos_g") - 1 <= SW_BIG[2])))
    inside = (spans.join(v, "doc_id")
              .filter((F.col("pos_v") > F.col("pos_g"))
                      & (F.col("pos_v") < F.col("pos_s")))
              .select("doc_id", "pos_v").distinct())
    return (inside.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_within"),
                 F.min("pos_v").alias("first_pos")))


ORACLES["q_span_within"] = f"""
WITH tok AS ({_POSTINGS_SQL}),
g AS (SELECT doc_id, pos AS pos_g FROM tok WHERE token = '{SW_BIG[0]}'),
s AS (SELECT doc_id, pos AS pos_s FROM tok WHERE token = '{SW_BIG[1]}'),
v AS (SELECT doc_id, pos AS pos_v FROM tok WHERE token = '{SW_LITTLE}'),
inside AS (
  SELECT DISTINCT g.doc_id, pos_v
  FROM g JOIN s ON g.doc_id = s.doc_id
  JOIN v ON v.doc_id = g.doc_id
  WHERE pos_s > pos_g AND pos_s - pos_g - 1 <= {SW_BIG[2]}
    AND pos_v > pos_g AND pos_v < pos_s)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_within,
       min(pos_v) AS first_pos
FROM inside GROUP BY doc_id"""

# ---------------------------------------------------------------------------
# Runtime fields — schema-on-read mappings aggregated like stored ones.

TIER_CUTS = (10.0, 50.0)


def q_runtime_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES runtime mappings: two fields computed at QUERY time — a value
    tier (low < {TIER_CUTS[0]}, mid < {TIER_CUTS[1]}, else high) and the
    event's hour-of-day — then a terms agg over (tier, hour band) as if
    they were mapped. Schema-on-read is free in Spark: the runtime
    expressions ride the scan; one partial-agg shuffle onto the tiny
    (tier × band) relation."""
    ev = load_events(spark, sf_dir)
    tier = (F.when(F.col("value") < TIER_CUTS[0], "low")
            .when(F.col("value") < TIER_CUTS[1], "mid")
            .otherwise("high"))
    hour = F.expr(f"(ts_ms div {HOUR_MS}) % 24")
    band = (F.when(hour < 12, "am").otherwise("pm"))
    dec = F.col("value").cast("decimal(18,2)")
    return (ev.groupBy(tier.alias("value_tier"), band.alias("day_half"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 roundn_col(F.sum(dec).cast("double")
                            / F.count(F.lit(1))).alias("avg_value")))


ORACLES["q_runtime_fields"] = f"""
SELECT CASE WHEN value < {TIER_CUTS[0]} THEN 'low'
            WHEN value < {TIER_CUTS[1]} THEN 'mid'
            ELSE 'high' END AS value_tier,
       CASE WHEN (epoch_ms(ts) // {HOUR_MS}) % 24 < 12
            THEN 'am' ELSE 'pm' END AS day_half,
       CAST(count(*) AS BIGINT) AS n_events,
       {roundn_sql('CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)'
                   ' / count(*)')} AS avg_value
FROM events GROUP BY 1, 2"""

# ---------------------------------------------------------------------------

QUERIES.update({
    "q_sibling_bucket_stats": q_sibling_bucket_stats,
    "q_normalize_agg": q_normalize_agg,
    "q_span_or": q_span_or,
    "q_span_within": q_span_within,
    "q_runtime_fields": q_runtime_fields,
})
