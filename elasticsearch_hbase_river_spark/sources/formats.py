"""Multi-format ingest/egress for the cells relation.

The reference reads exactly one source (HBase RPC scan, HBaseParser.java:
85-110) and writes exactly one sink (ES bulk REST). The engine keeps that
connector behind a thin interface (SURVEY.md §7 "no external HBase/ES in
scope") and generalizes the *format* axis: any landed representation of the
cells schema — parquet, ORC, CSV, JSON-lines — loads into the same canonical
relation, so upstream systems can hand the river whatever their export jobs
produce.

Scale notes: parquet/ORC are the only formats that carry pushdown + pruning
into the scan; CSV/JSON are row-formats that must be fully read (Spark still
parallelizes by split). ``read_cells`` therefore exists for interop, while
the engine's own sinks stay columnar. The explicit schema on every read is
deliberate — schema inference is a full extra pass over the data at 100 TB
(and types drift per-file); the cells schema is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from elasticsearch_hbase_river_spark.sources.tables import _tune_session

#: The canonical cells schema (SURVEY.md §1.4): all values strings (HBase
#: decodes every cell with one charset, HBaseParser.java:207-209), cell
#: timestamp as epoch-millis long.
CELLS_SCHEMA = StructType([
    StructField("row_key", StringType()),
    StructField("family", StringType()),
    StructField("qualifier", StringType()),
    StructField("value", StringType()),
    StructField("ts_ms", LongType()),
])

FORMATS = ("parquet", "orc", "csv", "json")

#: CSV needs explicit quote/escape so JSON-bearing values (the ``props``
#: qualifier) survive a round-trip; multiLine covers embedded newlines.
_CSV_OPTS = {"header": "true", "quote": '"', "escape": '"', "multiLine": "true"}


def write_cells(cells: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite") -> None:
    """Land a cells DataFrame in any supported format."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = cells.select([f.name for f in CELLS_SCHEMA.fields]).write.mode(mode)
    if fmt == "csv":
        w = w.options(**_CSV_OPTS)
    getattr(w, fmt)(path)


def read_cells(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load a landed cells table back into the canonical relation. The
    schema is imposed, never inferred (see module docstring)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    _tune_session(spark)
    r = spark.read.schema(CELLS_SCHEMA)
    if fmt == "csv":
        r = r.options(**_CSV_OPTS)
    return getattr(r, fmt)(path)
