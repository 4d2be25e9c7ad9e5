"""The bulksink writer connector: micro-batched bulk bodies, manifest-atomic
commit (the DSv2 replacement for per-item ack scanning,
HBaseParser.java:135-175), and exactly-once streaming epochs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.sources import bulksink


@pytest.fixture()
def docs(spark):
    return spark.range(0, 250).select(
        F.concat(F.lit("k"), F.col("id")).alias("doc_id"),
        (F.lit(1_700_000_000_000) + F.col("id")).alias("doc_ts_ms"),
        F.concat(F.lit('{"n":'), F.col("id"), F.lit("}")).alias("doc_json"),
    )


def test_batch_write_publishes_all_docs_in_bulk_files(spark, docs, tmp_path):
    bulksink.register(spark)
    path = str(tmp_path / "sink")
    (docs.repartition(4).write.format("bulksink")
     .option("path", path).option("batch_size", 30).mode("append").save())
    m = bulksink.read_manifest(path)
    assert m["n_docs"] == 250
    lines = bulksink.committed_lines(path)
    # two lines per doc: action + source
    assert len(lines) == 500
    actions = [json.loads(l) for l in lines[::2]]
    ids = {a["index"]["_id"] for a in actions}
    assert ids == {f"k{i}" for i in range(250)}


def test_bulk_files_respect_batch_size(spark, docs, tmp_path):
    bulksink.register(spark)
    path = str(tmp_path / "sink")
    (docs.repartition(4).write.format("bulksink")
     .option("path", path).option("batch_size", 30).mode("append").save())
    for fname in bulksink.read_manifest(path)["bulks"]:
        n_lines = sum(1 for l in open(f"{path}/{fname}") if l.strip())
        assert n_lines % 2 == 0 and n_lines // 2 <= 30


def test_append_merges_manifest(spark, docs, tmp_path):
    bulksink.register(spark)
    path = str(tmp_path / "sink")
    for _ in range(2):
        (docs.write.format("bulksink").option("path", path)
         .mode("append").save())
    assert bulksink.read_manifest(path)["n_docs"] == 500


def test_uncommitted_files_stay_invisible(spark, docs, tmp_path):
    """A file on disk that no manifest lists must never be read — that is
    the atomic-visibility contract replacing ack scanning."""
    bulksink.register(spark)
    path = str(tmp_path / "sink")
    (docs.write.format("bulksink").option("path", path)
     .mode("append").save())
    stray = tmp_path / "sink" / "bulk-deadbeef.ndjson"
    stray.write_text('{"index":{}}\n{"rogue":1}\n')
    lines = bulksink.committed_lines(path)
    assert all("rogue" not in l for l in lines)
    assert len(lines) == 500


def test_epoch_replay_publishes_exactly_once(spark, docs, tmp_path):
    """Replaying an epoch-tagged batch write (foreachBatch retry after a
    crash between sink write and checkpoint commit) must not
    double-publish: the manifest is the exactly-once ledger."""
    bulksink.register(spark)
    path = str(tmp_path / "sink")
    for _ in range(2):  # same epoch written twice
        (docs.write.format("bulksink").option("path", path)
         .option("epoch", 7).mode("append").save())
    m = bulksink.read_manifest(path)
    assert m["n_docs"] == 250
    assert m["epochs"] == [7]
    assert len(bulksink.committed_lines(path)) == 500


def test_connector_river_stream(spark, sf_dir, tmp_path):
    """cellstore stream -> document assembly -> bulksink, twice: the second
    availableNow run publishes only the appended delta."""
    from pyspark.sql import functions as F2

    from elasticsearch_hbase_river_spark.config import RiverConfig
    from elasticsearch_hbase_river_spark.sources import cellstore
    from elasticsearch_hbase_river_spark.sources.cells import cells_from_events
    from elasticsearch_hbase_river_spark.streaming.river_stream import (
        start_connector_river,
    )

    cells = cells_from_events(spark, sf_dir).persist()
    wm = int(cells.agg(F2.expr("percentile(ts_ms, 0.5)")).first()[0])
    old = cells.filter(F2.col("ts_ms") <= wm)
    new = cells.filter(F2.col("ts_ms") > wm)
    store = str(tmp_path / "store")
    bulk_dir = str(tmp_path / "bulk")
    ckpt = str(tmp_path / "ckpt")
    cellstore.write_cellstore(old, store, n_regions=3)
    config = RiverConfig(table="t", index="i", type_name="d",
                         column_separator="::")

    def drain() -> None:
        q = start_connector_river(spark, config, store, bulk_dir, ckpt,
                                  available_now=True)
        assert q.awaitTermination(180), "stream did not drain in 180s"

    drain()
    assert (bulksink.read_manifest(bulk_dir)["n_docs"]
            == old.select("row_key").distinct().count())
    cellstore.append_cells(new, store)
    drain()
    assert (bulksink.read_manifest(bulk_dir)["n_docs"]
            == cells.select("row_key").distinct().count())
    cells.unpersist()


def test_streaming_epochs_are_recorded_once(spark, docs, tmp_path):
    """availableNow restarts against the same checkpoint must not
    re-publish an epoch (exactly-once via the commit protocol)."""
    bulksink.register(spark)
    src = str(tmp_path / "src")
    path = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    docs.write.parquet(src)

    def tick() -> None:
        stream = spark.readStream.schema(
            "doc_id STRING, doc_ts_ms BIGINT, doc_json STRING").parquet(src)
        q = (stream.writeStream.format("bulksink").option("path", path)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120), "stream did not drain in 120s"

    tick()
    n1 = bulksink.read_manifest(path)["n_docs"]
    tick()  # no new source data -> no new epoch payload
    m = bulksink.read_manifest(path)
    assert n1 == 250
    assert m["n_docs"] == 250
    assert len(m["epochs"]) == len(set(m["epochs"]))
