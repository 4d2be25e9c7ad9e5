#!/usr/bin/env python
"""Percslots sidecar merge-cadence measurement (SCALE.md §3m addendum).

Layout v6 REBUILDS the percolator slot dictionary from the merged vocab on
every epoch merge (`operators/indexed_search.py:apply_epoch_deltas` —
churn can evict a slot's min-token, so it cannot carry over blindly).
This campaign puts a number on that policy at scale:

1. base index build over the fixture corpus;
2. one churn epoch (CHURN_PCT% re-indexed docs) through the real stream;
3. the epoch merge, timed end-to-end;
4. the percslots refresh ALONE (slot_dictionary over the merged vocab +
   the 1-file sidecar write) re-run standalone, timed — the marginal
   per-merge cost the every-merge cadence pays;
5. an index-served percolate match against the merged snapshot, timed
   warm — proving the amortization survives the merge (queries keep
   reading a persisted dictionary, never re-deriving it).

Usage: python tools/percslots_merge_scale.py [SF_DIR] [CHURN_PCT]
       defaults: /tmp/sf10 5

Prints one JSON line.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    churn_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from elasticsearch_hbase_river_spark.operators import indexed_search as ix
    from elasticsearch_hbase_river_spark.operators.esagg import (
        PERC_TERMS_PER_QUERY,
        _stored_queries_from_sidx,
        slot_dictionary,
    )
    from elasticsearch_hbase_river_spark.sources.tables import load_table
    from elasticsearch_hbase_river_spark.streaming.river_stream import (
        start_index_stream,
    )

    work = tempfile.mkdtemp(prefix="percslots_scale_")
    out: dict[str, object] = {"sf_dir": sf_dir, "churn_pct": churn_pct,
                              "cpus": int(cpus)}
    try:
        docs = (load_table(spark, sf_dir, "documents")
                .select("doc_id", "text"))
        out["n_docs"] = docs.count()

        base = os.path.join(work, "base_idx")
        t0 = time.time()
        ix.build_index(spark, docs, base)
        out["build_sec"] = round(time.time() - t0, 2)

        churn_thresh = round(churn_pct * 10)
        assert churn_thresh > 0
        changed = (docs.filter(F.pmod(F.xxhash64("doc_id"), 1000)
                               < churn_thresh)
                   .select("doc_id",
                           F.concat("text", F.lit(" refreshed epoch"))
                           .alias("text"),
                           F.lit(1).cast("long").alias("ver")))
        out["churn_docs"] = changed.count()
        assert out["churn_docs"] > 0

        src = os.path.join(work, "src")
        epochs = os.path.join(work, "epochs")
        changed.write.mode("append").parquet(src)
        q = start_index_stream(spark, src, epochs, os.path.join(work, "ck"))
        q.awaitTermination(1800)

        merged = os.path.join(work, "merged_idx")
        t0 = time.time()
        ix.apply_epoch_deltas(spark, base, epochs, merged)
        out["merge_sec"] = round(time.time() - t0, 2)

        # the refresh ALONE: merged-vocab scan -> <=PERC_SLOTS groupBy ->
        # 1-file write. This is the marginal cost of the refresh-on-every-
        # merge cadence; everything else in merge_sec is the postings
        # carry-over + the other sidecars.
        scratch = os.path.join(work, "percslots_scratch")
        t0 = time.time()
        (slot_dictionary(
            spark.read.parquet(os.path.join(merged, "vocab"))
            .select("token"))
         .coalesce(1).write.mode("overwrite").parquet(scratch))
        out["percslots_refresh_sec"] = round(time.time() - t0, 2)
        out["percslots_rows"] = spark.read.parquet(scratch).count()
        out["vocab_rows"] = (spark.read.parquet(
            os.path.join(merged, "vocab")).count())

        # refreshed sidecar == what the merge wrote (the cadence claim is
        # only safe if the standalone path measures the SAME computation)
        a = sorted(map(tuple, spark.read.parquet(scratch)
                       .select("sid", "token").collect()))
        b = sorted(map(tuple, ix.read_percslots(spark, merged).collect()))
        assert a == b, "standalone refresh diverged from the merge's"

        # warm index-served percolation against the merged snapshot: the
        # per-query cost must stay dictionary-read + pruned postings join
        def percolate_once() -> int:
            stored = _stored_queries_from_sidx(
                spark, ix.read_percslots(spark, merged), 8,
                PERC_TERMS_PER_QUERY).localCheckpoint(eager=True)
            qterms = tuple(sorted({r.token for r in stored.collect()}))
            doc_tok = (ix.read_postings(spark, merged, qterms)
                       .select("doc_id", "token"))
            matched = (doc_tok.join(F.broadcast(stored), "token")
                       .groupBy("doc_id", "query_id")
                       .agg(F.count(F.lit(1)).alias("n"))
                       .filter(F.col("n") == PERC_TERMS_PER_QUERY))
            return matched.count()

        percolate_once()                      # warm-up
        t0 = time.time()
        out["percolate_matches"] = percolate_once()
        out["percolate_warm_sec"] = round(time.time() - t0, 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
