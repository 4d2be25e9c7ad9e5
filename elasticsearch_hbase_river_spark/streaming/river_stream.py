"""Streaming river: the reference's polling scheduler re-expressed as a
Structured Streaming query.

Reference mapping (SURVEY.md §2.1 rows 15, 11, 4; §3.3):

- scheduler loop, first run immediate then every ``interval`` ms
  (HBaseParser.java:49-73)            -> ``Trigger.ProcessingTime`` /
                                         ``availableNow`` for drain-and-stop
- micro-batched bulk sink (HBaseParser.java:135-162)
                                      -> ``foreachBatch`` upsert writer
- incremental watermark from the sink (HBaseParser.java:258-280)
                                      -> checkpointed source offsets (the
                                         idiomatic replacement; sink-max
                                         lookup stays a recovery path —
                                         SURVEY.md §7 "hard parts")
- ``stopThread`` clean shutdown (HBaseParser.java:249-251, :53-70)
                                      -> ``StreamingQuery.stop()``
- late data: the reference re-reads everything above the sink max-ts; the
  streaming twin instead bounds state with an event-time watermark.

The source is a file stream of cells (parquet); in production this is
Kafka/CDC — the transform chain is source-agnostic because it only sees the
canonical cells schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from elasticsearch_hbase_river_spark.config import RiverConfig
from elasticsearch_hbase_river_spark.plans.pipeline import assemble_documents

CELLS_SCHEMA = StructType([
    StructField("row_key", StringType()),
    StructField("family", StringType()),
    StructField("qualifier", StringType()),
    StructField("value", StringType()),
    StructField("ts_ms", LongType()),
])


def read_cells_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream of cells. ``maxFilesPerTrigger`` is the streaming
    analog of the reference's scan batch size (HBaseParser.java:104)."""
    return (
        spark.readStream.schema(CELLS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def start_river_stream(
    spark: SparkSession,
    config: RiverConfig,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the streaming river. ``available_now=True`` drains the backlog
    and stops (the testable mode); otherwise triggers every
    ``config.interval_ms`` like the reference's scheduler."""
    cells = read_cells_stream(spark, source_dir)
    if config.family:
        cells = cells.filter(F.col("family") == config.family)
    if config.qualifiers:
        cells = cells.filter(F.col("qualifier").isin(*config.qualifiers))

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch = the bulk writer (HBaseParser.java:135-162). Within
        # a micro-batch, latest-wins per doc id; across batches, append +
        # read-time latest-wins (a real system MERGEs into Delta/Iceberg).
        docs = assemble_documents(batch_df, config)
        (docs.withColumn("batch_id", F.lit(batch_id))
             .write.mode("append").parquet(sink_dir))

    writer = (
        assemble_and_stream(cells, config)
        .writeStream
        .foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{config.interval_ms} milliseconds")
    return writer.start()


def assemble_and_stream(cells: DataFrame, config: RiverConfig) -> DataFrame:
    """Hook point: the per-batch transform happens in foreachBatch (document
    assembly needs a full-row group); the stream itself stays untransformed
    cells. Kept separate so windowed variants can pre-aggregate here."""
    return cells


def streaming_event_rollup(spark: SparkSession, source_dir: str) -> DataFrame:
    """Streaming twin of q_event_rollup: watermarked hourly windowed counts
    — late cells beyond 2h are dropped instead of re-scanned (the reference
    re-reads everything newer than sink-max each tick; a watermark bounds
    state at scale)."""
    cells = read_cells_stream(spark, source_dir)
    return (
        cells.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "family")
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .select(F.col("window.start").alias("hour_start"), "family", "n_cells")
    )
