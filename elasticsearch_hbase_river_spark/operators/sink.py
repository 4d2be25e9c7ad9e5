"""Sink-side parity operators (SURVEY.md §2.1 rows 11-13).

The reference accumulates ``batchSize`` index requests per bulk call
(HBaseParser.java:135-162), excludes failed bulk ids from the post-index
delete set via an in-memory hash (:164-175), and optionally deletes acked
rows from the source (:176-180).

Spark-first shape: bulk batching is a deterministic batch-id assignment (in
production, ``foreachBatch`` / per-partition buffered writers do this without
any global ordering); the failed-id exclusion is a ``left_anti`` join that
Catalyst executes as a broadcast-hash anti join when the failed set is small
(it always is); delete candidates are a relational set difference.

Scale note: the oracle-checked ``q_batch_assign`` uses a global
``row_number`` for determinism — at 100 TB the engine's pipeline instead
batches per partition (no global sort); see plans/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.sources.cells import CELLS_CTE, cells_from_events
from elasticsearch_hbase_river_spark.sources.tables import load_events

BATCH_SIZE = 100  # reference default, HBaseRiver.java:59-62,150

#: Key-range width per ranking block in q_batch_assign: ~1000 rows/block
#: for dense ids; at 100 TB pick block ≈ rows_per_task so the per-block
#: window state stays executor-sized. Correct for ANY key density (blocks
#: may be uneven or empty — only their order matters).
BATCH_ASSIGN_BLOCK = 1_000

#: Deterministic synthetic "bulk failure" predicate for the oracle: every
#: 13th row key fails (stands in for the BulkResponse failure scan,
#: HBaseParser.java:164-175).
FAILED_MOD = 13


def _failed_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (ev.filter(F.col("event_id") % FAILED_MOD == 0)
              .select(F.col("event_id").cast("string").alias("row_key")))


def q_batch_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch assignment: floor((rank-1)/batchSize)
    (HBaseParser.java:137-162).

    The global rank is built WITHOUT a single-partition window (which would
    funnel the whole corpus through one task): rows block on a DETERMINISTIC
    key range (``event_id div BLOCK``, no sampling pass, no caching needed),
    rank locally inside each block, and add each block's cumulative row
    offset — a #blocks-row relation that broadcasts. Key order across blocks
    == block order, so the result is bit-identical to row_number() OVER
    (ORDER BY event_id) at any parallelism."""
    ev = load_events(spark, sf_dir).select("event_id")
    block = (F.col("event_id") / BATCH_ASSIGN_BLOCK).cast("long")
    blocked = ev.withColumn("blk", block)
    counts = blocked.groupBy("blk").agg(F.count(F.lit(1)).alias("cnt"))
    # window over the tiny per-block counts relation (one row per block)
    offsets = counts.select(
        "blk",
        (F.sum("cnt").over(Window.orderBy("blk")) - F.col("cnt")).alias("offset"))
    local = blocked.withColumn(
        "lrn", F.row_number().over(Window.partitionBy("blk").orderBy("event_id")))
    return (local.join(F.broadcast(offsets), "blk")
            .select(
                F.col("event_id").cast("string").alias("row_key"),
                (F.col("lrn") + F.col("offset")).cast("long").alias("rn"))
            .withColumn("batch_id",
                        F.expr(f"CAST((rn - 1) div {BATCH_SIZE} AS BIGINT)")))


def q_failed_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acked = sent minus failed (HBaseParser.java:164-175). ``left_anti``
    join; the failed side is broadcast by Catalyst (small set)."""
    ev = load_events(spark, sf_dir)
    sent = ev.select(F.col("event_id").cast("string").alias("row_key"),
                     "event_type", "ts_ms")
    return sent.join(F.broadcast(_failed_keys(spark, sf_dir)), "row_key", "left_anti")


def q_delete_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deleteOld: distinct acked row keys eligible for source deletion
    (HBaseParser.java:176-180); failed keys are excluded (:170-177)."""
    cells = cells_from_events(spark, sf_dir)
    return (cells.join(F.broadcast(_failed_keys(spark, sf_dir)), "row_key", "left_anti")
                 .select("row_key").distinct())


def q_es_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk-API payload rendering: every assembled document as its
    action/source line pair (HBaseParser.java:137-159 — the request build
    half of the bulk sink, which IS checkable without Elasticsearch)."""
    from elasticsearch_hbase_river_spark.operators.assemble import q_doc_pivot
    from elasticsearch_hbase_river_spark.operators.bulk_sink import es_bulk_lines

    return es_bulk_lines(
        q_doc_pivot(spark, sf_dir).select(
            F.col("doc_id"), F.col("doc_ts_ms"), F.col("doc_json")))


#: Synthetic sink drift for the reconcile oracle: every 13th row key is
#: missing from the sink, every 7th is stale (older timestamp).
STALE_MOD = 7


def q_sink_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source↔sink reconciliation: FULL OUTER join of the assembled source
    documents against the sink on doc_id, each row classified as in_sync /
    stale / missing_in_sink / orphaned. The consistency check an
    incremental importer runs after the fact — the reference trusts its
    watermark blindly (SURVEY.md §2.1 row 4); this is the audit that
    catches drift. One shuffle per side on doc_id; at 100 TB both sides
    prune to the audited key range first."""
    ev = load_events(spark, sf_dir)
    source = ev.select(F.col("event_id").cast("string").alias("doc_id"),
                       F.col("ts_ms").alias("src_ts_ms"))
    # simulated sink: 13th keys never landed, 7th landed stale
    sink = (ev.filter(F.col("event_id") % FAILED_MOD != 0)
            .select(F.col("event_id").cast("string").alias("doc_id"),
                    F.when(F.col("event_id") % STALE_MOD == 0,
                           F.col("ts_ms") - 1)
                     .otherwise(F.col("ts_ms")).alias("sink_ts_ms")))
    j = source.join(sink, "doc_id", "full_outer")
    status = (
        F.when(F.col("src_ts_ms").isNull(), "orphaned")
         .when(F.col("sink_ts_ms").isNull(), "missing_in_sink")
         .when(F.col("sink_ts_ms") < F.col("src_ts_ms"), "stale")
         .otherwise("in_sync"))
    return j.select("doc_id", "src_ts_ms", "sink_ts_ms",
                    status.alias("status"))


QUERIES = {
    "q_batch_assign": q_batch_assign,
    "q_failed_anti_join": q_failed_anti_join,
    "q_delete_candidates": q_delete_candidates,
    "q_es_bulk": q_es_bulk,
    "q_sink_reconcile": q_sink_reconcile,
}

ORACLES = {
    "q_batch_assign": f"""
WITH r AS (
  SELECT CAST(event_id AS VARCHAR) AS row_key,
         CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS rn
  FROM events)
SELECT row_key, rn, CAST((rn - 1) // {BATCH_SIZE} AS BIGINT) AS batch_id FROM r""",

    "q_failed_anti_join": f"""
SELECT CAST(e.event_id AS VARCHAR) AS row_key, e.event_type, epoch_ms(e.ts) AS ts_ms
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM events f
  WHERE f.event_id % {FAILED_MOD} = 0 AND f.event_id = e.event_id)""",

    "q_delete_candidates": f"""{CELLS_CTE}
SELECT DISTINCT row_key FROM cells
WHERE CAST(row_key AS BIGINT) % {FAILED_MOD} <> 0""",

    "q_sink_reconcile": f"""
WITH source AS (
  SELECT CAST(event_id AS VARCHAR) AS doc_id, epoch_ms(ts) AS src_ts_ms
  FROM events),
sink AS (
  SELECT CAST(event_id AS VARCHAR) AS doc_id,
         CASE WHEN event_id % {STALE_MOD} = 0 THEN epoch_ms(ts) - 1
              ELSE epoch_ms(ts) END AS sink_ts_ms
  FROM events WHERE event_id % {FAILED_MOD} <> 0)
SELECT coalesce(source.doc_id, sink.doc_id) AS doc_id,
       src_ts_ms, sink_ts_ms,
       CASE WHEN src_ts_ms IS NULL THEN 'orphaned'
            WHEN sink_ts_ms IS NULL THEN 'missing_in_sink'
            WHEN sink_ts_ms < src_ts_ms THEN 'stale'
            ELSE 'in_sync' END AS status
FROM source FULL OUTER JOIN sink ON source.doc_id = sink.doc_id""",
}


def _es_bulk_oracle() -> str:
    from elasticsearch_hbase_river_spark.operators.assemble import (
        ORACLES as _ASSEMBLE_ORACLES,
    )
    from elasticsearch_hbase_river_spark.operators.bulk_sink import ES_INDEX, ES_TYPE

    pivot = _ASSEMBLE_ORACLES["q_doc_pivot"]
    action = (f"""'{{"index":{{"_index":"{ES_INDEX}","_type":"{ES_TYPE}","_id":"'"""
              f""" || doc_id || '","_timestamp":' || doc_ts_ms || '}}}}'""")
    return f"""
WITH piv AS ({pivot})
SELECT doc_id, {action} || chr(10) || doc_json AS bulk FROM piv"""


ORACLES["q_es_bulk"] = _es_bulk_oracle()
