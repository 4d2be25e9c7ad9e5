"""Parquet table loaders for the driver-generated fixture tables.

The fixture ``events.ts`` column is physical parquet ``TIMESTAMP(NANOS)``,
which Spark's parquet reader rejects by default; we flip the runtime conf
``spark.sql.legacy.parquet.nanosAsLong`` so it surfaces as a ``LongType``
epoch-nanos column and convert with exact integer arithmetic (``div``), never
floating point (an int64 epoch-nanos value does not fit in a double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

NANOS_PER_MILLI = 1_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; column pruning/pushdown stays with Catalyst."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` as epoch-nanos long plus derived ``ts_ms``."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_ms", F.expr(f"ts div {NANOS_PER_MILLI}"))
