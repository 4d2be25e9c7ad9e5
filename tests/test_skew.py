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
