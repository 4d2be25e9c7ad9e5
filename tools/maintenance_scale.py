#!/usr/bin/env python
"""Index-MAINTENANCE scale campaign (SCALE.md §3h): drive the freshness
loop (stream -> epoch merge -> alias swap) at a scaled fixture with a
configurable churn epoch, and measure what the 100 TB story actually
claims:

1. merge wall-time vs full-rebuild wall-time (the delta path must win);
2. the sidecar refresh plans read ONLY base sidecars + the delta — never
   the postings table (the test_streaming audit, re-run at scale);
3. merge == rebuild EXACTLY: vocab/stats sidecars compare row-for-row and
   the BM25 serving surface hash-matches over the merged vs rebuilt index.

Usage: python tools/maintenance_scale.py [SF_DIR] [CHURN_PCT] [NEW_PCT]
       defaults: /tmp/sf1 5 1

Prints one JSON line. Driver memory: default session (the deployment-
config note in SCALE.md §3g applies at sf30+: PYSPARK_SUBMIT_ARGS
"--driver-memory 4g pyspark-shell").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    churn_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    new_pct = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from elasticsearch_hbase_river_spark.operators import indexed_search as ix
    from elasticsearch_hbase_river_spark.sources.tables import load_table
    from elasticsearch_hbase_river_spark.streaming.river_stream import (
        start_index_stream,
    )

    work = tempfile.mkdtemp(prefix="maint_scale_")
    out: dict[str, object] = {"sf_dir": sf_dir, "churn_pct": churn_pct,
                              "new_pct": new_pct, "cpus": int(cpus)}
    try:
        docs = (load_table(spark, sf_dir, "documents")
                .select("doc_id", "text"))
        n_docs = docs.count()
        out["n_docs"] = n_docs

        base = os.path.join(work, "base_idx")
        t0 = time.time()
        ix.build_index(spark, docs, base)
        out["build_sec"] = round(time.time() - t0, 2)

        # churn epoch: churn_pct% re-indexed with changed text, new_pct%
        # brand-new docs (ids past the existing range)
        max_id = docs.agg(F.max("doc_id")).first()[0]
        # round, don't truncate: churn_pct below 0.1 would int() to a zero
        # threshold and the campaign would time a no-op delta yet report pass
        churn_thresh = round(churn_pct * 10)
        new_thresh = round(new_pct * 10)
        assert churn_thresh > 0 and new_thresh > 0, (
            f"churn_pct={churn_pct} / new_pct={new_pct} select no docs at "
            "pmod-1000 granularity — raise them or refine the selector")
        changed = (docs.filter(F.pmod(F.xxhash64("doc_id"), 1000)
                               < churn_thresh)
                   .select("doc_id",
                           F.concat("text", F.lit(" refreshed epoch"))
                           .alias("text"), F.lit(1).cast("long").alias("ver")))
        fresh_new = (docs.filter(F.pmod(F.xxhash64("doc_id", F.lit(7)), 1000)
                                 < new_thresh)
                     .select((F.col("doc_id") + max_id + 1).alias("doc_id"),
                             F.concat("text", F.lit(" newly arrived"))
                             .alias("text"),
                             F.lit(1).cast("long").alias("ver")))
        delta_docs = changed.unionByName(fresh_new)
        out["churn_docs"] = changed.count()
        assert out["churn_docs"] > 0, (
            "churn selector matched no documents — the merge timing below "
            "would measure a no-op delta")
        out["new_docs"] = fresh_new.count()

        src = os.path.join(work, "src")
        epochs = os.path.join(work, "epochs")
        delta_docs.write.mode("append").parquet(src)
        t0 = time.time()
        q = start_index_stream(spark, src, epochs, os.path.join(work, "ck"))
        q.awaitTermination(1200)
        out["stream_sec"] = round(time.time() - t0, 2)

        merged = os.path.join(work, "merged_idx")
        t0 = time.time()
        ix.apply_epoch_deltas(spark, base, epochs, merged)
        out["merge_sec"] = round(time.time() - t0, 2)
        alias = os.path.join(work, "alias.json")
        ix.write_alias(alias, merged)
        assert ix.resolve_alias(alias) == merged

        # audit: sidecar refresh plans never read the postings table
        from elasticsearch_hbase_river_spark.streaming.river_stream import (
            read_epoch_docs,
            read_inverted_index,
        )
        fr = read_inverted_index(spark, epochs).localCheckpoint(eager=True)
        fd = read_epoch_docs(spark, epochs).localCheckpoint(eager=True)
        dbk = sorted({r[0] for r in fd.select(
            ix._dbucket(F.col("doc_id"))).collect()})
        plans = ix._delta_sidecar_plans(spark, base, fr, fd, dbk)
        for name, plan in plans.items():
            files = plan.inputFiles()
            assert files and not any("/postings/" in f for f in files), (
                f"{name} refresh reads postings")
        out["sidecar_audit"] = "pass"

        # ground truth: full rebuild over the post-churn corpus
        latest = (docs.join(changed.select("doc_id"), "doc_id", "left_anti")
                  .unionByName(delta_docs.select("doc_id", "text")))
        rebuild = os.path.join(work, "rebuild_idx")
        t0 = time.time()
        ix.build_index(spark, latest, rebuild)
        out["rebuild_sec"] = round(time.time() - t0, 2)

        # exactness: sidecars row-for-row, serving surface hash-equal
        # bit_xor, not sum: row hashes are full-range longs and an ANSI
        # sum overflows; xor is order-independent and exact.
        def vhash(path: str) -> list:
            return (ix.read_vocab(spark, path, fields=True)
                    .select(F.xxhash64("token", "df", "freq", "df_title",
                                       "df_body").alias("h"))
                    .agg(F.count(F.lit(1)), F.expr("bit_xor(h)")).first())

        def dlhash(path: str) -> list:
            return (ix.read_doclen(spark, path)
                    .select(F.xxhash64("doc_id", "dl").alias("h"))
                    .agg(F.count(F.lit(1)), F.expr("bit_xor(h)")).first())

        assert vhash(merged) == vhash(rebuild), "vocab sidecar diverged"
        assert dlhash(merged) == dlhash(rebuild), "doclen sidecar diverged"
        sm, sr = ix.index_stats(merged), ix.index_stats(rebuild)
        assert sm == sr, f"stats diverged: {sm} vs {sr}"
        bm = sorted(map(tuple, ix.bm25_from_index(spark, merged).collect()))
        br = sorted(map(tuple, ix.bm25_from_index(spark, rebuild).collect()))
        assert bm == br, "BM25 serving diverged"
        out["exactness"] = "pass"
        out["merge_vs_rebuild"] = round(
            out["merge_sec"] / out["rebuild_sec"], 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
