"""elasticsearch_hbase_river_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of ``mallocator/Elasticsearch-HBase-River``.

The reference is an Elasticsearch "river" plugin that incrementally imports an
HBase table into an ES index (scan -> transform -> bulk upsert). This package
re-expresses that dataflow — and the LLM-training-data-pipeline extensions
(dedup, similarity search, multimodal columns, text analysis) — as idiomatic
Spark DataFrame plans:

- ``sources``    : canonical ``cells`` ingest relation (the HBase-cell shape)
                   and parquet table loaders.
- ``functions``  : pure column-expression builders (normalize, qualifier
                   split, text metrics, vector math) + pure-Python twins used
                   by the unit tests that port the reference's test suite.
- ``operators``  : each operator from SURVEY.md §2 as a function
                   ``(spark, sf_dir) -> DataFrame`` plus its DuckDB oracle
                   SQL twin.
- ``plans``      : the end-to-end river pipeline (the reference's per-tick
                   dataflow, HBaseParser.java:82-181) in batch form.
- ``streaming``  : the Structured Streaming form (the reference's polling
                   scheduler, HBaseParser.java:49-73, becomes a triggered
                   streaming query).

Design stance (SURVEY.md §7): DataFrame API everywhere, zero custom Catalyst
rules, built-in functions over UDFs; Pandas UDFs only where semantics force
Python (multimodal decode). Every operator is written for 100 TB scale:
filters push to the parquet scan, small sides broadcast, aggregations are
partial-aggregable, and nothing collects to the driver.
"""

__version__ = "0.1.0"

# Process-level Py4J resolution caching (see py4j_cache module docstring):
# installed at package import so every entry point (driver, bench, tools,
# tests) builds DataFrame plans without re-reflecting immutable JVM
# structure on each F.*/Column call.
from elasticsearch_hbase_river_spark import py4j_cache as _py4j_cache

_py4j_cache.install()

from elasticsearch_hbase_river_spark.config import RiverConfig  # noqa: F401
