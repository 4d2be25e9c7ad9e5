"""The canonical ``cells`` ingest relation — the HBase-cell shape.

The reference's unit of input is the HBase ``KeyValue`` cell
``(key, family, qualifier, value, timestamp)`` (HBaseParser.java:146,204-216);
a row is the group of cells sharing a row key. Per FIXTURES.md §1 the engine
derives this long/"melted" relation deterministically from the ``events``
fixture table; every §2.1 parity operator consumes it.

Schema (all parity queries agree on this):

    row_key   STRING   -- cast(event_id)
    family    STRING   -- 'meta' (event_type,user_id) | 'data' (value,props)
    qualifier STRING
    value     STRING   -- all HBase values are strings (HBaseParser.java:207-209)
    ts_ms     BIGINT   -- cell timestamp as epoch millis (exact integer math)

Determinism contract with the DuckDB oracle (:data:`CELLS_SQL` is the
verbatim SQL twin): doubles go through DECIMAL(18,2) before the string cast
so both engines render identical text; timestamps are integer epoch-millis.

Scale note: the melt is a narrow projection + generator — no shuffle, fully
pipelined into whatever consumes it, and Catalyst prunes the parquet scan to
the referenced columns. At 100 TB the cells table would be a real table
partitioned by ``ts`` date (SURVEY.md §4), and every downstream watermark
filter becomes partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.sources.tables import (
    load_table, ts_ms_col, ts_watermark_pred)

# One generator expression; stack() stays inside whole-stage codegen.
_MELT = """
stack(4,
  'meta', 'event_type', event_type,
  'meta', 'user_id',    CAST(user_id AS STRING),
  'data', 'value',      CAST(CAST(value AS DECIMAL(18,2)) AS STRING),
  'data', 'props',      props
) AS (family, qualifier, value)
"""


def cells_from_events(spark: SparkSession, sf_dir: str,
                      min_ts_ms_exclusive: int | None = None,
                      fanout: bool = False) -> DataFrame:
    """Melt ``events`` into the canonical ``cells`` relation.

    ``min_ts_ms_exclusive`` is the incremental-scan watermark
    (scanner.setMinTimestamp, HBaseParser.java:272). It is applied to the
    RAW ``ts`` column before the melt — a filter on the derived ``ts_ms``
    cannot be pushed into the parquet scan, so at scale it would read every
    row group; the equivalent raw predicate against a foldable literal
    (``ts_watermark_pred``, schema-adaptive) pushes down (and prunes
    partitions on a date-partitioned cells table).

    ``fanout=True`` passes through to :func:`load_table` (scale-adaptive
    round-robin) for CPU-heavy per-cell consumers — the melt multiplies
    rows 4x and string/regex work on the melted cells otherwise runs in
    the fixture's single scan task."""
    ev = load_table(spark, sf_dir, "events", fanout=fanout)
    if min_ts_ms_exclusive is not None:
        ev = ev.filter(ts_watermark_pred(ev, min_ts_ms_exclusive))
    return ev.select(
        F.col("event_id").cast("string").alias("row_key"),
        ts_ms_col(ev).alias("ts_ms"),
        F.expr(_MELT),
    ).select("row_key", "family", "qualifier", "value", "ts_ms")


#: DuckDB twin of :func:`cells_from_events` — keep in lockstep.
#: (DuckDB reads the nanos timestamp natively; epoch_ms() floors to millis,
#: identical to the Spark-side integer `div`.)
CELLS_SQL = """
SELECT CAST(event_id AS VARCHAR) AS row_key, 'meta' AS family,
       'event_type' AS qualifier, event_type AS value, epoch_ms(ts) AS ts_ms
FROM events
UNION ALL
SELECT CAST(event_id AS VARCHAR), 'meta', 'user_id',
       CAST(user_id AS VARCHAR), epoch_ms(ts)
FROM events
UNION ALL
SELECT CAST(event_id AS VARCHAR), 'data', 'value',
       CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), epoch_ms(ts)
FROM events
UNION ALL
SELECT CAST(event_id AS VARCHAR), 'data', 'props', props, epoch_ms(ts)
FROM events
"""

CELLS_CTE = f"WITH cells AS ({CELLS_SQL})"


def melt_wide_table(df: DataFrame, key_col: str, ts_ms_expr: str,
                    family_map: dict[str, list[str]],
                    charset: str = "UTF-8") -> DataFrame:
    """Generic wide-table -> cells melt for arbitrary ingest tables.

    ``family_map`` assigns each source column to a family. This is how any
    relational table enters the river pipeline — the Spark analog of "an
    HBase table". Binary columns are decoded with the configured
    ``charset`` (the reference decodes every cell with one charset,
    HBaseRiver.java:74,151; HBaseParser.java:207-209); everything else is
    cast to string (all HBase values are strings).
    """
    binary_cols = {f.name for f in df.schema.fields
                   if f.dataType.typeName() == "binary"}
    entries = []
    for family, columns in family_map.items():
        for c in columns:
            v = f"decode({c}, '{charset}')" if c in binary_cols \
                else f"CAST({c} AS STRING)"
            entries.append(f"'{family}', '{c}', {v}")
    n = sum(len(v) for v in family_map.values())
    melt = f"stack({n}, {', '.join(entries)}) AS (family, qualifier, value)"
    return df.select(
        F.col(key_col).cast("string").alias("row_key"),
        F.expr(ts_ms_expr).alias("ts_ms"),
        F.expr(melt),
    ).select("row_key", "family", "qualifier", "value", "ts_ms")
