"""End-to-end river pipeline semantics (SURVEY.md §3.2)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.config import RiverConfig
from elasticsearch_hbase_river_spark.plans.pipeline import (
    flagship, river_tick_plan, run_once, sink_max_ts,
)
from elasticsearch_hbase_river_spark.sources.cells import cells_from_events


@pytest.fixture()
def cfg():
    return RiverConfig(table="events", index="river", type_name="doc",
                       column_separator="::", delete_old=True)


def test_flagship_documents_are_valid_sorted_json(spark, sf_dir):
    rows = flagship(spark, sf_dir).limit(50).collect()
    assert rows
    for r in rows:
        doc = json.loads(r.doc_json)  # escaping is correct
        assert set(doc) <= {"data", "meta"}
        assert list(doc) == sorted(doc)  # deterministic key order
        assert r.doc_id == r.row_key


def test_tick_is_incremental(spark, sf_dir, cfg, tmp_path):
    cells = cells_from_events(spark, sf_dir)
    sink = str(tmp_path / "sink")
    r1 = run_once(spark, cells, cfg, sink)
    assert r1.rows_indexed == 1000
    assert r1.deleted_keys == 1000  # delete_old: acked rows eligible
    r2 = run_once(spark, cells, cfg, sink)
    assert r2.rows_indexed == 0  # watermark: nothing new
    assert r2.watermark_ms == r1.watermark_ms
    assert sink_max_ts(spark, sink) == r1.watermark_ms


def test_tick_picks_up_new_cells(spark, sf_dir, cfg, tmp_path):
    cells = cells_from_events(spark, sf_dir)
    sink = str(tmp_path / "sink")
    old = cells.filter(F.col("ts_ms") % 2 == 0)
    new = cells.filter(F.col("ts_ms") % 2 == 1)
    r1 = run_once(spark, old, cfg, sink)
    # second tick sees the full table; only cells above the watermark load
    r2 = run_once(spark, cells, cfg, sink)
    expected_new = (new.filter(F.col("ts_ms") > r1.watermark_ms - 1)
                    .select("row_key").distinct().count())
    assert r2.rows_indexed == expected_new


def test_family_and_qualifier_pushdown(spark, sf_dir):
    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      family="meta", qualifiers=("event_type",))
    out = river_tick_plan(cells_from_events(spark, sf_dir), cfg, 0)
    docs = out.limit(5).collect()
    for r in docs:
        doc = json.loads(r.doc_json)
        assert list(doc) == ["meta"]
        assert list(doc["meta"]) == ["event_type"]


def test_id_field_path_extraction(spark, sf_dir):
    """idField config routes doc_id through the separator-path lookup
    (findKeyInDataTree parity) instead of the row key."""
    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      column_separator="::", id_field="meta::user_id")
    out = river_tick_plan(cells_from_events(spark, sf_dir), cfg, 0)
    rows = out.limit(20).collect()
    assert rows
    for r in rows:
        doc = json.loads(r.doc_json)
        assert r.doc_id == doc["meta"]["user_id"]
        assert r.doc_id != r.row_key or doc["meta"]["user_id"] == r.row_key


def test_id_field_normalizes_path_components(spark, sf_dir):
    """A dirty configured path ('Meta::User_ID!') matches the normalized
    document keys."""
    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      column_separator="::", id_field="Meta::User_ID!")
    out = river_tick_plan(cells_from_events(spark, sf_dir), cfg, 0)
    r = out.limit(1).collect()[0]
    assert r.doc_id == json.loads(r.doc_json)["meta"]["user_id"]


def test_id_field_missing_path_drops_rows(spark, sf_dir):
    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      column_separator="::", id_field="meta::nonexistent")
    out = river_tick_plan(cells_from_events(spark, sf_dir), cfg, 0)
    assert out.count() == 0


def test_bulk_write_respects_batch_size(spark, sf_dir, cfg, tmp_path):
    """batchSize parity: each sink file holds at most batch_size rows (the
    bulk-request analog, HBaseRiver.java:59-62)."""
    import glob

    cells = cells_from_events(spark, sf_dir)
    sink = str(tmp_path / "sink_bulk")
    small = RiverConfig(table="events", index="river", type_name="doc",
                        column_separator="::", batch_size=100)
    run_once(spark, cells, small, sink)
    files = glob.glob(sink + "/*.parquet")
    assert files
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 100


def test_bulk_write_day_partitioned_sink(spark, sf_dir, cfg, tmp_path):
    """Date-partitioned sink layout: a time-ranged read prunes partitions
    (the 100 TB watermark-lookup shape)."""
    import os

    from elasticsearch_hbase_river_spark.operators.bulk_sink import write_bulk

    docs = river_tick_plan(cells_from_events(spark, sf_dir), cfg, 0)
    sink = str(tmp_path / "sink_part")
    write_bulk(docs, sink, batch_size=500, partition_by_day=True)
    parts = [d for d in os.listdir(sink) if d.startswith("dt=")]
    assert parts
    back = spark.read.parquet(sink)
    assert back.count() == 1000
    one_day = parts[0][len("dt="):]
    pruned = back.filter(F.col("dt") == one_day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "dt" in plan


def test_dead_letter_channel(spark, sf_dir, cfg, tmp_path):
    """Failure channel: rejected rows land in the dead-letter table with a
    reason; acked excludes them (failed-key exclusion parity)."""
    from pyspark.sql import functions as F

    from elasticsearch_hbase_river_spark.operators.bulk_sink import (
        write_with_dead_letter,
    )

    docs = river_tick_plan(cells_from_events(spark, sf_dir), cfg, 0)
    sink = str(tmp_path / "sink_dl")
    dlq = str(tmp_path / "dlq")
    res = write_with_dead_letter(
        docs, sink, dlq,
        reject_when=F.col("doc_id").endswith("7"),
        reason="synthetic bulk failure")
    assert res.rows_acked + res.rows_failed == 1000
    assert res.rows_failed == 100  # ids 7, 17, ..., 997
    dead = spark.read.parquet(dlq)
    assert dead.count() == 100
    assert dead.filter(F.col("reject_reason") != "synthetic bulk failure").count() == 0
    acked = spark.read.parquet(sink)
    assert acked.count() == 900
    assert acked.filter(F.col("doc_id").endswith("7")).count() == 0


def test_run_once_with_failure_channel(spark, sf_dir, tmp_path):
    """Failed bulk items are dead-lettered and excluded from the ack/delete
    count (failed-key exclusion, end-to-end through run_once)."""
    from pyspark.sql import functions as F

    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      column_separator="::", delete_old=True)
    cells = cells_from_events(spark, sf_dir)
    sink = str(tmp_path / "sink_f")
    dlq = str(tmp_path / "dlq_f")
    r = run_once(spark, cells, cfg, sink,
                 reject_when=F.col("doc_id").endswith("3"),
                 dead_letter_path=dlq)
    assert r.rows_indexed == 900
    assert r.deleted_keys == 900          # failed keys NOT delete candidates
    assert spark.read.parquet(dlq).count() == 100


def test_dedup_against_sink(spark, sf_dir, tmp_path):
    from elasticsearch_hbase_river_spark.plans.pipeline import dedup_against_sink

    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      column_separator="::")
    cells = cells_from_events(spark, sf_dir)
    sink = str(tmp_path / "sink_dd")
    run_once(spark, cells, cfg, sink)
    docs = river_tick_plan(cells, cfg, 0)
    # everything is already indexed -> all dropped
    assert dedup_against_sink(spark, docs, sink).count() == 0
    # unseen content -> kept
    fresh = docs.withColumn("doc_json", F.concat("doc_json", F.lit(" ")))
    assert dedup_against_sink(spark, fresh, sink).count() == 1000
    # cold start (no sink) -> passthrough
    assert dedup_against_sink(spark, docs,
                              str(tmp_path / "nope")).count() == 1000


def test_assembly_adversarial_cells(spark):
    """The one-shuffle fold must agree with the reference semantics on
    hostile input: LWW collisions (same leaf, different ts — and ts ties
    broken by value), separator-nested qualifiers, empty-trailing collapse,
    dirty names, values needing JSON escaping, multiple families."""
    from elasticsearch_hbase_river_spark.functions.normalize import normalize_field_py
    from elasticsearch_hbase_river_spark.functions.qualifier import effective_path
    from elasticsearch_hbase_river_spark.plans.pipeline import assemble_documents

    rows = [
        # row_key, family, qualifier, value, ts_ms
        ("r1", "Fam!", "a::b::c", "v1", 10),
        ("r1", "Fam!", "a::b::c", "v2-newer", 20),     # LWW on ts
        ("r1", "Fam!", "x::", "collapsed", 5),          # empty-trailing
        ("r1", "other", "q", 'say "hi" \\ bye', 7),     # escaping
        ("r2", "m", "tie", "AAA", 5),
        ("r2", "m", "tie", "BBB", 5),                   # ts tie -> max value
    ]
    cells = spark.createDataFrame(
        rows, "row_key string, family string, qualifier string, "
              "value string, ts_ms long")
    cfg = RiverConfig(table="t", index="i", type_name="d",
                      column_separator="::")
    got = {r.row_key: r for r in assemble_documents(cells, cfg).collect()}

    def leaf(q):
        return "::".join(effective_path(q, "::"))

    d1 = json.loads(got["r1"].doc_json)
    f = normalize_field_py("Fam!", "::")
    assert d1[f][leaf("a::b::c")] == "v2-newer"          # newest wins
    assert d1[f][leaf("x::")] == "collapsed"
    assert leaf("x::") == "x"                            # collapse semantics
    assert d1["other"]["q"] == 'say "hi" \\ bye'         # round-trips JSON
    assert got["r1"].doc_ts_ms == 5                      # min over kept cells
    d2 = json.loads(got["r2"].doc_json)
    assert d2["m"]["tie"] == "BBB"                       # deterministic tie
    assert list(d1) == sorted(d1)                        # sorted keys


def test_cli_batch_tick(spark, sf_dir, tmp_path):
    """The import.sh analog: one CLI invocation = one incremental tick."""
    from elasticsearch_hbase_river_spark.__main__ import main

    src = str(tmp_path / "cells_src")
    cells_from_events(spark, sf_dir).write.mode("overwrite").parquet(src)
    sink = str(tmp_path / "cli_sink")
    rc = main(["--source", src, "--sink", sink,
               "--table", "events", "--index", "river", "--type", "doc",
               "--separator", "::", "--batch-size", "500"])
    assert rc == 0
    # main() reuses (and must not stop) the ambient test session
    assert spark.read.parquet(sink).count() == 1000


def test_cli_batch_tick_from_csv_source(spark, sf_dir, tmp_path):
    """The river ingests a CSV landing of the cells relation end-to-end."""
    from elasticsearch_hbase_river_spark.__main__ import main
    from elasticsearch_hbase_river_spark.sources.formats import write_cells

    src = str(tmp_path / "cells_csv")
    write_cells(cells_from_events(spark, sf_dir), src, "csv")
    sink = str(tmp_path / "cli_sink_csv")
    rc = main(["--source", src, "--sink", sink, "--source-format", "csv",
               "--table", "events", "--index", "river", "--type", "doc",
               "--batch-size", "500"])
    assert rc == 0
    assert spark.read.parquet(sink).count() == 1000


def test_melt_wide_table_feeds_the_river(spark, sf_dir):
    """Any relational table enters the pipeline via the generic melt;
    binary columns are decoded with the configured charset."""
    from elasticsearch_hbase_river_spark.sources.cells import melt_wide_table
    from elasticsearch_hbase_river_spark.sources.tables import load_table

    orders = (load_table(spark, sf_dir, "orders").limit(20)
              .withColumn("bin_priority", F.encode("o_orderpriority", "UTF-8")))
    cells = melt_wide_table(
        orders, key_col="o_orderkey", ts_ms_expr="CAST(1 AS BIGINT)",
        family_map={"o": ["o_orderpriority", "bin_priority", "o_totalprice"]})
    got = {(r.row_key, r.qualifier): r.value for r in cells.collect()}
    src = orders.collect()
    for r in src:
        k = str(r.o_orderkey)
        # binary column decoded == its string source (charset parity)
        assert got[(k, "bin_priority")] == got[(k, "o_orderpriority")]
        assert got[(k, "o_totalprice")] is not None

    cfg = RiverConfig(table="orders", index="river", type_name="doc",
                      column_separator="::")
    docs = river_tick_plan(cells, cfg, 0)
    assert docs.count() == 20
    doc = json.loads(docs.limit(1).collect()[0].doc_json)
    assert set(doc) == {"o"}
    assert set(doc["o"]) == {"o_orderpriority", "bin_priority", "o_totalprice"}


def test_custom_sink_mapping(spark, sf_dir, tmp_path):
    """Custom mapping passthrough (parity row 16, HBaseRiver.java:118-122,
    250-261): the sink lands with the user-declared schema — declared
    columns cast, missing columns as typed NULLs, extras dropped."""
    cfg = RiverConfig(
        table="events", index="river", type_name="doc", column_separator="::",
        custom_mapping="doc_id STRING, doc_ts_ms LONG, doc_json STRING, "
                       "ingest_tag STRING")
    cells = cells_from_events(spark, sf_dir)
    sink = str(tmp_path / "sink_map")
    r = run_once(spark, cells, cfg, sink)
    assert r.rows_indexed == 1000
    out = spark.read.parquet(sink)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("doc_id", "string"), ("doc_ts_ms", "bigint"),
        ("doc_json", "string"), ("ingest_tag", "string")]
    assert "row_key" not in out.columns          # unmapped column dropped
    assert out.filter(F.col("ingest_tag").isNotNull()).count() == 0
    # the watermark still works on the mapped sink
    r2 = run_once(spark, cells, cfg, sink)
    assert r2.rows_indexed == 0


def test_custom_sink_mapping_requires_watermark_column(spark, sf_dir, tmp_path):
    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      custom_mapping="doc_id STRING, doc_json STRING")
    with pytest.raises(ValueError, match="doc_ts_ms"):
        run_once(spark, cells_from_events(spark, sf_dir), cfg,
                 str(tmp_path / "sink_bad"))


def test_upsert_latest_wins(spark, sf_dir, cfg):
    cells = cells_from_events(spark, sf_dir)
    # duplicate every cell with a newer ts and marker value
    newer = cells.withColumn("ts_ms", F.col("ts_ms") + 10_000) \
                 .withColumn("value", F.lit("NEWER"))
    out = river_tick_plan(cells.unionByName(newer), cfg, 0)
    sample = out.limit(20).collect()
    assert sample
    for r in sample:
        doc = json.loads(r.doc_json)
        for fam in doc.values():
            for v in fam.values():
                assert v == "NEWER"


def test_approx_stats_within_bounds(spark, sf_dir):
    """The sketch aggregates must land near their exact twins: HLL++ within
    5% relative error on distinct users; approx percentiles inside the
    observed value range and within 15% of exact."""
    from elasticsearch_hbase_river_spark.operators.analytics import q_approx_stats
    from elasticsearch_hbase_river_spark.sources.tables import load_events

    approx = {r.event_type: r for r in q_approx_stats(spark, sf_dir).collect()}
    ev = load_events(spark, sf_dir)
    exact = {r.event_type: r for r in
             ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("users"),
                 F.expr("percentile(value, 0.5)").alias("p50"),
                 F.expr("percentile(value, 0.95)").alias("p95"),
             ).collect()}
    assert set(approx) == set(exact)
    for t, a in approx.items():
        e = exact[t]
        assert abs(a.approx_users - e.users) <= max(2, 0.05 * e.users)
        assert abs(a.approx_p50 - e.p50) <= max(0.5, 0.15 * abs(e.p50))
        assert abs(a.approx_p95 - e.p95) <= max(0.5, 0.15 * abs(e.p95))


def test_near_dedup_against_sink_history_survives_restarts(spark, sf_dir, tmp_path):
    """The persistent LSH band table dedups new docs against the WHOLE
    historical corpus, across process restarts: tick 1 seeds history,
    tick 2 (fresh read of the on-disk state) rejects a truncated
    near-copy of a tick-1 doc while accepting a genuinely new doc, and
    tick 3 rejects a copy of the doc ACCEPTED in tick 2 — history grows
    with every accepted doc, not just the seed corpus."""
    from elasticsearch_hbase_river_spark.plans.pipeline import (
        near_dedup_against_sink,
    )

    bands = str(tmp_path / "sink_bands")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))

    # tick 1: cold start — everything accepted, history seeded
    seed = docs.filter(F.col("doc_id") < 50)
    acc1 = near_dedup_against_sink(spark, seed, bands)
    assert acc1.count() == seed.count()

    # tick 2: near-copy of doc 0 (drop last 3 tokens) + genuinely new doc
    near_copy = seed.filter(F.col("doc_id") == 0).select(
        F.lit(9_000_000).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1,
                             F.greatest(F.size(F.split("text", " ")) - 3,
                                        F.lit(1))), " ").alias("text"))
    fresh = docs.filter(F.col("doc_id") == 77).select(
        F.lit(9_000_001).alias("doc_id"),
        F.array_join(F.reverse(F.split("text", " ")), " ").alias("text"))
    acc2 = near_dedup_against_sink(
        spark, near_copy.unionByName(fresh), bands)
    got2 = {r.doc_id for r in acc2.collect()}
    assert got2 == {9_000_001}, f"tick2 accepted {got2}"

    # tick 3: exact copy of the doc accepted in tick 2 — history includes
    # tick-2 acceptances, so it must now be rejected
    copy_of_fresh = fresh.select(F.lit(9_000_002).alias("doc_id"), "text")
    acc3 = near_dedup_against_sink(spark, copy_of_fresh, bands)
    assert acc3.count() == 0


def test_vector_index_upsert_equals_rebuild(spark, sf_dir, tmp_path):
    """Vector-index maintenance: merging a delta batch latest-version-wins
    must serve the SAME index a from-scratch build over the merged corpus
    would — for every serving table (cells assignment and centroids)."""
    from pyspark.sql import functions as F

    from elasticsearch_hbase_river_spark.operators import vector_index as vx
    from elasticsearch_hbase_river_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base_dir = str(tmp_path / "vidx_base")
    vx.build_vector_index(spark, emb, base_dir)

    # delta: one moved vector (vec 3 gets vec 5's embedding and label) and
    # one brand-new vector cloned from vec 7
    moved = (emb.filter(F.col("vec_id") == 5)
             .select(F.lit(3).cast("long").alias("vec_id"),
                     "embedding", "label"))
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    new = (emb.filter(F.col("vec_id") == 7)
           .select(F.lit(max_id + 1).cast("long").alias("vec_id"),
                   "embedding", "label"))
    delta = moved.unionByName(new)

    merged_dir = str(tmp_path / "vidx_merged")
    vx.upsert_vectors(spark, base_dir, delta, merged_dir)

    rebuilt_corpus = (
        emb.filter(~F.col("vec_id").isin(3))
        .unionByName(emb.filter(F.col("vec_id") == 5)
                     .select(F.lit(3).cast("long").alias("vec_id"),
                             "embedding", "label")
                     .select("vec_id", "embedding", "label"))
        .unionByName(new.select("vec_id", "embedding", "label"))
    )
    rebuilt_dir = str(tmp_path / "vidx_rebuilt")
    vx.build_vector_index(spark, rebuilt_corpus, rebuilt_dir)

    def snap_cells(path):
        return sorted(
            (r["vec_id"], r["cell"]) for r in
            vx.read_cells(spark, path).select("vec_id", "cell").collect())

    def snap_centroids(path):
        return sorted(
            (r["cell"], tuple(r["centroid"])) for r in
            vx.read_centroids(spark, path).collect())

    assert snap_cells(merged_dir) == snap_cells(rebuilt_dir)
    assert snap_centroids(merged_dir) == snap_centroids(rebuilt_dir)


def test_reindex_alias_swap_is_zero_downtime(spark, sf_dir, tmp_path):
    """ES blue-green reindex: readers resolve the alias to the old index
    generation until the atomic swap, the new generation serves the
    transformed corpus afterwards, and the old directory stays intact for
    rollback."""
    from pyspark.sql import functions as F

    from elasticsearch_hbase_river_spark.operators import indexed_search as ix
    from elasticsearch_hbase_river_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    gen1 = str(tmp_path / "idx_gen1")
    gen2 = str(tmp_path / "idx_gen2")
    alias = str(tmp_path / "docs_alias.json")

    ix.build_index(spark, docs, gen1)
    ix.write_alias(alias, gen1)
    assert ix.resolve_alias(alias) == gen1
    n1 = ix.read_doclen(spark, ix.resolve_alias(alias)).count()
    assert n1 == docs.count()

    # reindex with a filter transform (drop even doc_ids) + swap
    ix.reindex(spark, docs.filter(F.col("doc_id") % 2 == 1), alias, gen2)
    assert ix.resolve_alias(alias) == gen2
    n2 = ix.read_doclen(spark, ix.resolve_alias(alias)).count()
    assert n2 == docs.filter(F.col("doc_id") % 2 == 1).count()
    # old generation intact for rollback
    assert ix.read_doclen(spark, gen1).count() == n1
    ix.write_alias(alias, gen1)
    assert ix.resolve_alias(alias) == gen1


def test_band_sink_refuses_incompatible_format(spark, sf_dir, tmp_path):
    """The persistent band table is stamped with a format-version sidecar;
    a history written by an older engine version (md5 hex STRING bands)
    must be refused — appending BIGINT bands would create a mixed-schema
    directory whose string-vs-bigint join silently misses every
    historical near-dup."""
    from elasticsearch_hbase_river_spark.plans.pipeline import (
        _BANDS_META, BANDS_FORMAT_VERSION, near_dedup_against_sink,
    )

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").filter(F.col("doc_id") < 20))

    # fresh sink: accepted, and stamped with the current format version
    bands = str(tmp_path / "bands_ok")
    near_dedup_against_sink(spark, docs, bands)
    with open(f"{bands}/{_BANDS_META}") as f:
        assert json.load(f)["format_version"] == BANDS_FORMAT_VERSION
    # compatible history: appends fine
    near_dedup_against_sink(
        spark, docs.select((F.col("doc_id") + 10_000).alias("doc_id"),
                           "text"), bands)

    # v1 history (string bands, pre-round-4): refused with guidance
    legacy = str(tmp_path / "bands_legacy")
    spark.createDataFrame(
        [(1, ["aa"], 0, "deadbeef")],
        "doc_id long, mh array<string>, band_idx int, band_hash string",
    ).write.parquet(legacy)
    with pytest.raises(ValueError, match="format_version"):
        near_dedup_against_sink(spark, docs, legacy)

    # unstamped directory of unknown provenance: also refused
    unstamped = str(tmp_path / "bands_unstamped")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(unstamped)
    with pytest.raises(ValueError, match="format_version"):
        near_dedup_against_sink(spark, docs, unstamped)


def test_vector_upsert_into_occupied_out_path_raises(spark, sf_dir, tmp_path):
    """Publishing a merged vector index into an out_path that ALREADY
    holds an index must fail loudly — the old behavior silently kept the
    stale directory while the caller believed the merge landed."""
    from elasticsearch_hbase_river_spark.operators import vector_index as vx
    from elasticsearch_hbase_river_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base_dir = str(tmp_path / "vidx_base")
    vx.build_vector_index(spark, emb, base_dir)

    delta = emb.filter(F.col("vec_id") == 5).select(
        F.lit(3).cast("long").alias("vec_id"), "embedding", "label")
    occupied = str(tmp_path / "vidx_occupied")
    vx.build_vector_index(spark, emb, occupied)
    with pytest.raises(OSError):
        vx.upsert_vectors(spark, base_dir, delta, occupied)


def test_band_table_compaction_cadence_and_equivalence(spark, sf_dir, tmp_path):
    """The band table's log-compaction loop (SCALE.md §3n): the tick
    counter advances per append, the policy fires at the cadence, the
    rewrite shrinks the file count without changing a single row, and a
    post-compaction tick still rejects a near-copy of PRE-compaction
    history."""
    from collections import Counter

    from elasticsearch_hbase_river_spark.plans.pipeline import (
        band_compaction_due,
        band_ticks_since_compact,
        compact_band_table,
        near_dedup_against_sink,
    )

    bands = str(tmp_path / "compact_bands")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    assert band_ticks_since_compact(bands) == 0
    for i in range(3):
        tick = docs.filter((F.col("doc_id") >= 20 * i)
                           & (F.col("doc_id") < 20 * (i + 1)))
        near_dedup_against_sink(spark, tick, bands)
        assert band_ticks_since_compact(bands) == i + 1
    assert not band_compaction_due(bands, every_n=3 + 1)
    assert band_compaction_due(bands, every_n=3)

    def snapshot():
        # mh is an array column — tuple-ify for hashable multiset compare
        return Counter(
            tuple(tuple(v) if isinstance(v, list) else v for v in row)
            for row in spark.read.parquet(bands).collect())

    before = snapshot()
    stats = compact_band_table(spark, bands)
    assert stats["rows"] == sum(before.values())
    assert stats["files_after"] < stats["files_before"]
    assert snapshot() == before       # content-identical rewrite
    assert band_ticks_since_compact(bands) == 0

    # post-compaction tick: a near-copy of pre-compaction history (doc 0,
    # last 3 tokens dropped) is still rejected
    near_copy = docs.filter(F.col("doc_id") == 0).select(
        F.lit(9_100_000).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1,
                             F.greatest(F.size(F.split("text", " ")) - 3,
                                        F.lit(1))), " ").alias("text"))
    assert near_dedup_against_sink(spark, near_copy, bands).count() == 0
    assert band_ticks_since_compact(bands) == 1


def test_band_compaction_crash_window_is_loud(spark, sf_dir, tmp_path):
    """A compaction that crashed mid-swap (bands dir renamed aside, rewrite
    not yet renamed in) must REFUSE the next tick with recovery
    instructions — not silently start an empty history; a stranded .old
    beside a live marker-valid table (crash after the rename-in) is
    benign and cleaned."""
    import pytest

    from elasticsearch_hbase_river_spark.plans.pipeline import (
        near_dedup_against_sink,
    )

    bands = str(tmp_path / "crash_bands")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(20))
    near_dedup_against_sink(spark, docs, bands)

    # simulate the mid-swap crash: history stranded aside, no live table
    import os
    import shutil

    stranded = bands + ".old-deadbeef"
    os.rename(bands, stranded)
    with pytest.raises(RuntimeError, match="mid-swap"):
        near_dedup_against_sink(spark, docs, bands)
    # recovery per the error message: move the history back, tick works
    os.rename(stranded, bands)
    near_dedup_against_sink(spark, docs, bands)

    # benign tail: live table + superseded .old -> cleaned, tick proceeds
    shutil.copytree(bands, bands + ".old-cafe")
    near_dedup_against_sink(spark, docs, bands)
    assert not os.path.exists(bands + ".old-cafe")


def test_band_auto_compaction_fires_at_cadence(spark, sf_dir, tmp_path):
    """The cadence is wired into the tick itself: with compact_every=2 the
    second append triggers an in-tick compaction (counter resets, files
    collapse) and the RETURNED accepted frame stays materializable after
    the swap deleted the files its lineage referenced."""
    from elasticsearch_hbase_river_spark.plans.pipeline import (
        _band_files,
        band_ticks_since_compact,
        near_dedup_against_sink,
    )

    bands = str(tmp_path / "auto_bands")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    t1 = docs.filter(F.col("doc_id") < 20)
    t2 = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
    near_dedup_against_sink(spark, t1, bands, compact_every=2)
    assert band_ticks_since_compact(bands) == 1
    acc = near_dedup_against_sink(spark, t2, bands, compact_every=2)
    assert band_ticks_since_compact(bands) == 0   # compaction ran in-tick
    assert len(_band_files(bands)) == 1
    assert acc.count() == t2.count()              # lineage survived swap


def test_index_mode_marker_refuses_mixed_tokenizations(spark, tmp_path):
    """The analyzer mode rides the same marker discipline as the layout
    version: a unicode-built index refuses ascii epochs (and vice versa)
    at BOTH maintenance entry points — the epoch merge and the live
    serve — and the stream writer refuses to resume cross-mode."""
    import pytest

    from elasticsearch_hbase_river_spark.operators import indexed_search as ix
    from elasticsearch_hbase_river_spark.operators import liveserve as lv
    from elasticsearch_hbase_river_spark.streaming.river_stream import (
        start_index_stream,
    )

    uni_docs = spark.createDataFrame(
        [(1, "Grüße données café"), (2, "données et café")],
        "doc_id long, text string")
    uni_idx = str(tmp_path / "uni_idx")
    ix.build_index(spark, uni_docs, uni_idx, mode="unicode")
    assert ix.index_mode(uni_idx) == "unicode"

    # ascii epochs from the stream writer
    src = str(tmp_path / "src")
    spark.createDataFrame([(3, "plain ascii text", None)],
                          "doc_id long, text string, ver long") \
        .write.mode("append").parquet(src)
    epochs = str(tmp_path / "ascii_epochs")
    q = start_index_stream(spark, src, epochs, str(tmp_path / "ck1"))
    assert q.awaitTermination(120), "stream did not drain in 120s"

    with pytest.raises(ValueError, match="analyzer mode"):
        ix.apply_epoch_deltas(spark, uni_idx, epochs,
                              str(tmp_path / "merged"))
    with pytest.raises(ValueError, match="analyzer mode"):
        lv.bm25_live(spark, uni_idx, epochs, terms=("café",), top=5)

    # resuming the SAME epochs dir with a unicode-mode stream refuses too
    spark.createDataFrame([(4, "more ascii", None)],
                          "doc_id long, text string, ver long") \
        .write.mode("append").parquet(src)
    q2 = start_index_stream(spark, src, epochs, str(tmp_path / "ck1"),
                            mode="unicode")
    with pytest.raises(Exception, match="analyzer mode"):
        assert q2.awaitTermination(120)
        q2.processAllAvailable()
