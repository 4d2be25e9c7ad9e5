"""Bucketed co-located join: the join must plan with zero Exchange nodes."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.sources.bucketing import (
    read_bucketed, write_bucketed,
)
from elasticsearch_hbase_river_spark.sources.tables import load_events


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # managed tables land in the session's default warehouse; DROP TABLE
    # in the finally block removes the files (warehouse.dir is static
    # config and cannot be pointed at tmp_path at runtime)
    ev = load_events(spark, sf_dir)
    left = ev.select("user_id", "event_id", "event_type")
    right = (ev.groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n_events")))
    write_bucketed(left, "b_left", "user_id", n_buckets=8)
    write_bucketed(right, "b_right", "user_id", n_buckets=8)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffled-join path (the case bucketing exists for —
        # at scale neither fact side is broadcastable)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_bucketed(spark, "b_left").join(
            read_bucketed(spark, "b_right"), "user_id")
        # co-located: both sides pre-bucketed on the key -> no shuffle
        assert "Exchange hashpartitioning" not in _plan(j)
        assert "SortMergeJoin" in _plan(j)
        # and the join result is correct
        assert j.count() == left.count()
        assert j.filter(F.col("n_events") < 1).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_aggregation_reuses_layout(spark, sf_dir):
    """A groupBy on the bucket key must also run shuffle-free."""
    ev = load_events(spark, sf_dir).select("user_id", "value")
    write_bucketed(ev, "b_agg", "user_id", n_buckets=8)
    try:
        agg = (read_bucketed(spark, "b_agg")
               .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
        assert "Exchange" not in _plan(agg)
        assert agg.count() == ev.select("user_id").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")
