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


_INFER_FROM_GENERATE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def _tune_session(spark: SparkSession) -> None:
    """Runtime confs the engine needs regardless of who built the session.

    - ``nanosAsLong``: see module docstring.
    - exclude ``InferFiltersFromGenerate``: the rule infers ``size(g) > 0``
      below every ``explode``, and predicate pushdown then substitutes the
      generator's full expression into that filter — for computed arrays
      (shingles, minhash bands) the whole higher-order-function expression
      is re-evaluated per input row, measured 8x slower at sf0.1
      (SPARK-36715 pathology). ``explode`` already drops empty/null arrays,
      so excluding the rule is semantics-preserving.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    current = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    if not current:
        spark.conf.set("spark.sql.optimizer.excludedRules", _INFER_FROM_GENERATE)
    elif _INFER_FROM_GENERATE not in current:
        spark.conf.set("spark.sql.optimizer.excludedRules",
                       f"{current},{_INFER_FROM_GENERATE}")


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fanout: bool = False) -> DataFrame:
    """Read one fixture table; column pruning/pushdown stays with Catalyst.

    ``fanout=True`` inserts a round-robin repartition to defaultParallelism
    for CPU-heavy map-side consumers stuck behind the fixtures'
    single-row-group layout (one scan task). Catalyst pushes filters and
    pruning THROUGH the repartition, so pushdown-sensitive plans keep their
    PushedFilters. Measured at sf0.1 this is a wash-to-loss for ordinary
    scan→partial-agg queries (their cost is planning/codegen, and the extra
    exchange + sort-before-repartition adds more than it buys), so it is
    OFF by default and opt-in per operator.
    """
    _tune_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fanout:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` as epoch-nanos long plus derived ``ts_ms``."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_ms", F.expr(f"ts div {NANOS_PER_MILLI}"))
