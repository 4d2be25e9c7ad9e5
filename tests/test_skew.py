"""Salted join: identical results to the plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed big side: 90% of rows share key 0
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"))
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim"))

    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", buckets=8).select("k", "payload", "dim")

    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark):
    big = spark.range(1000).select((F.col("id") % 7).alias("k"),
                                   F.col("id").alias("payload"))
    small = spark.range(3).select(F.col("id").alias("k"),
                                  F.lit("d").alias("dim"))
    plain = big.join(small, "k", "left").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", buckets=4, how="left") \
        .select("k", "payload", "dim")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_substring_dedup_hot_span_skew(spark):
    """One boilerplate span shared by 10% of documents: the duplicated-
    span window must stay O(1)-state (min/max, never a per-row doc set)
    and the report must stay exact — every hot-span doc flagged with the
    full boilerplate run, unique docs absent."""
    from elasticsearch_hbase_river_spark.operators.dedup import (
        SUB_L,
        substring_dup_report,
    )

    n = 2_000
    boiler = " ".join(f"b{i}" for i in range(SUB_L + 5))  # 20-token span
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0,
               F.concat(F.lit("u"), F.col("id"), F.lit(" x"), F.col("id"),
                        F.lit(" " + boiler + " tail"), F.col("id")))
        .otherwise(F.concat_ws(" ", *[
            F.concat(F.lit(f"w{j}d"), F.col("id"))
            for j in range(SUB_L + 2)])).alias("text"))

    rows = {r.doc_id: r for r in substring_dup_report(docs).collect()}
    hot = [d for d in range(n) if d % 10 == 0]
    assert set(rows) == set(hot)
    for d in hot:
        # the shared region is exactly the boilerplate span
        assert rows[d].max_run_tokens == SUB_L + 5
        assert rows[d].dup_windows == 6  # (SUB_L+5) - SUB_L + 1

    plan = substring_dup_report(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "collect_set" not in plan
