"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship river pipeline (SURVEY.md §3.2) on
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB twin (keys without a twin get the weaker
rows-only check — only genuinely non-SQL-expressible ops omit one).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elasticsearch_hbase_river_spark.plans.pipeline import flagship  # noqa: E402
from elasticsearch_hbase_river_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
