"""Streaming river: drain-and-stop (availableNow) end-to-end."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.config import RiverConfig
from elasticsearch_hbase_river_spark.sources.cells import cells_from_events
from elasticsearch_hbase_river_spark.streaming.river_stream import (
    start_river_stream, streaming_event_rollup,
)


def _write_cells(spark, sf_dir, out, n_files=4):
    cells_from_events(spark, sf_dir).repartition(n_files) \
        .write.mode("overwrite").parquet(out)


def test_stream_drains_and_upserts(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write_cells(spark, sf_dir, src)
    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      column_separator="::", interval_ms=1000)
    q = start_river_stream(spark, cfg, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    # every row key appears exactly once per micro-batch it arrived in;
    # with maxFilesPerTrigger=16 and 4 files this is a single batch
    assert out.select("doc_id").distinct().count() == 1000
    doc = json.loads(out.limit(1).collect()[0].doc_json)
    assert set(doc) <= {"data", "meta"}

    # restart with no new files: checkpoint prevents reprocessing
    q2 = start_river_stream(spark, cfg, src, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == out.count()


def test_streaming_rollup_plan_is_streaming(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src2")
    _write_cells(spark, sf_dir, src)
    df = streaming_event_rollup(spark, src)
    assert df.isStreaming
    q = (df.writeStream.format("memory").queryName("rollup_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # watermarked append-mode windows close only when the watermark passes;
    # with a bounded backlog the final window stays open, so just assert the
    # query ran and the in-flight state machinery works
    assert spark.table("rollup_t").columns == ["hour_start", "family", "n_cells"]
