"""Bulk sink writer: the reference's micro-batched bulk pipeline
(HBaseParser.java:135-181) as reusable library functions.

Reference mapping:

- ``batchSize`` ops/bulk (HBaseRiver.java:59-62,150)  -> ``maxRecordsPerFile``
  on the writer: each output file is one "bulk request"; executors write
  their partitions in parallel instead of the reference's sequential RPCs.
- failed-key exclusion (HBaseParser.java:164-175)     -> ``left_anti`` ack
  join; Catalyst broadcasts the (small) failed set automatically.
- dead-letter channel (HBaseCallbackLogger)           -> failed rows land in
  a side parquet table with the failure reason, never lost.
- delete-after-read (HBaseParser.java:176-180)        -> the acked key set,
  returned for the caller to apply to the source.

Scale: no global sort or repartition is imposed here — ``maxRecordsPerFile``
splits within each task, so writing stays embarrassingly parallel at any
executor count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class BulkWriteResult:
    rows_acked: int
    rows_failed: int


def write_bulk(docs: DataFrame, path: str, batch_size: int = 100,
               mode: str = "append", partition_by_day: bool = False) -> None:
    """Append documents as parquet with at most ``batch_size`` rows per file
    (the bulk-request analog, HBaseParser.java:137-162).

    ``partition_by_day`` lays the sink out as ``dt=YYYY-MM-DD/`` directories
    derived from ``doc_ts_ms`` — at scale this is what makes the watermark
    lookup (max doc_ts) and any time-ranged read partition-pruned instead
    of a full-table scan."""
    w = docs
    if partition_by_day:
        w = docs.withColumn(
            "dt", F.date_format(F.timestamp_millis(F.col("doc_ts_ms")),
                                "yyyy-MM-dd"))
    writer = w.write.option("maxRecordsPerFile", batch_size).mode(mode)
    if partition_by_day:
        writer = writer.partitionBy("dt")
    writer.parquet(path)


ES_INDEX = "river"      # hbase.index config analog, HBaseRiver.java:41,144
ES_TYPE = "doc"         # hbase.type config analog


def es_bulk_lines(docs: DataFrame, index: str = ES_INDEX,
                  doc_type: str = ES_TYPE) -> DataFrame:
    """(doc_id, bulk): each document rendered as an Elasticsearch bulk-API
    action/source line pair — the exact payload the reference accumulates
    per IndexRequest (id + timestamp + source document,
    HBaseParser.java:145-159). Pure string projection, map-side at any
    scale; row keys are JSON-safe (normalized alphabet, HBaseRiver.java:
    314-326), so no escaping pass is needed on ``_id``."""
    action = F.concat(
        F.lit(f'{{"index":{{"_index":"{index}","_type":"{doc_type}","_id":"'),
        F.col("doc_id"),
        F.lit('","_timestamp":'), F.col("doc_ts_ms").cast("string"),
        F.lit("}}"))
    return docs.select(
        "doc_id", F.concat(action, F.lit("\n"), F.col("doc_json")).alias("bulk"))


def write_es_bulk(docs: DataFrame, path: str, index: str = ES_INDEX,
                  doc_type: str = ES_TYPE, batch_size: int = 100,
                  mode: str = "append") -> None:
    """Write documents as Elasticsearch bulk files: newline-delimited
    action/source pairs, at most ``batch_size`` documents per file — each
    output file IS one bulk request body (``curl --data-binary @file
    .../_bulk``), the file-sink twin of the reference's one-RPC-per-batch
    loop (HBaseParser.java:137-162). Executors write files in parallel."""
    (es_bulk_lines(docs, index, doc_type).select("bulk")
     .write.option("maxRecordsPerFile", batch_size).mode(mode).text(path))


def split_failed(docs: DataFrame, reject_when: Column) -> tuple[DataFrame, DataFrame]:
    """Split a keyed document batch into (acked, failed) on a reject
    predicate — the engine analog of scanning the bulk response for failed
    item ids (HBaseParser.java:164-175). Both halves share the input plan;
    callers persist ``docs`` if both are materialized."""
    failed = docs.filter(reject_when)
    acked = docs.join(failed.select("doc_id"), "doc_id", "left_anti")
    return acked, failed


def write_with_dead_letter(docs: DataFrame, sink_path: str,
                           dead_letter_path: str, reject_when: Column,
                           reason: str, batch_size: int = 100) -> BulkWriteResult:
    """Bulk write with a failure channel: rows matching ``reject_when`` go
    to the dead-letter table with a reason column; everything else is
    bulk-appended to the sink. Failed keys are excluded from the ack set,
    so delete-after-read never drops source rows that didn't land
    (HBaseParser.java:166-177)."""
    docs = docs.persist()
    try:
        acked, failed = split_failed(docs, reject_when)
        write_bulk(acked, sink_path, batch_size)
        n_failed = failed.count()
        if n_failed:
            (failed.withColumn("reject_reason", F.lit(reason))
                   .write.mode("append").parquet(dead_letter_path))
        return BulkWriteResult(rows_acked=acked.count(), rows_failed=n_failed)
    finally:
        docs.unpersist()
