"""Bucketed co-located joins: pre-shuffle once at write time, join with NO
exchange forever after.

At 100 TB the dominant cost of a repeated fact⋈fact join (events⋈sessions,
cells⋈sink-state, signatures⋈candidates) is re-shuffling both sides on
every run. Bucketing moves that shuffle to write time: both tables are
hash-partitioned into the same number of buckets on the join key when
LANDED, so Spark's planner proves both sides already share the required
distribution and plans a sort-merge join with ZERO Exchange nodes
(``test_bucketing.py`` pins this plan shape).

This is the table-layout twin of ``functions/skew.py`` (runtime shuffle
hygiene) — together they cover the shuffle strategy row of SURVEY.md §4's
scale notes. Bucketed tables require the session catalog (``saveAsTable``);
pass a warehouse-backed session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 32, mode: str = "overwrite") -> None:
    """Land ``df`` as a bucketed+sorted managed table on ``key``. Sorting
    within buckets lets the downstream sort-merge join skip its sort too."""
    (df.write.mode(mode)
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table_name))


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
