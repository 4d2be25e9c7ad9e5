"""Document-assembly parity operators (SURVEY.md §2.1 rows 5-10, 14).

The reference folds each row's cells into a nested JSON document
(readDataTree, HBaseParser.java:204-216), splitting qualifiers into nested
maps (readQualifierStructure, :226-244), normalizing field names
(HBaseRiver.java:314-326), extracting the document id either from the row key
(:150-153) or by path lookup (:184-194), and relying on ES upsert-by-id so
the latest version wins.

Spark-first shape: the row fold is ONE ``groupBy(row_key)`` shuffle; nested
documents are built as deterministic sorted-key JSON strings with pure
built-in string/array functions (no UDF, no per-row Python) so the plan stays
inside whole-stage codegen; the upsert becomes a per-key window rank. At
100 TB the groupBy shuffles on row_key — salt only if key hot-spotting
appears (SURVEY.md §4); everything else is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.normalize import (
    normalize_field_col,
    normalize_sql,
)
from elasticsearch_hbase_river_spark.functions.qualifier import (
    split_qualifier_col,
    split_qualifier_sql,
)
from elasticsearch_hbase_river_spark.sources.cells import CELLS_CTE, cells_from_events
from elasticsearch_hbase_river_spark.sources.tables import load_events

SEP = "::"


def _esc_json(col: F.Column) -> F.Column:
    r"""JSON string escaping done by hand (``\`` then ``"``) so Spark and the
    DuckDB oracle build byte-identical documents — no JSON library variance."""
    return F.replace(F.replace(col, F.lit("\\"), F.lit("\\\\")),
                     F.lit('"'), F.lit('\\"'))


_ESC_SQL = r"""replace(replace({v}, '\', '\\'), '"', '\"')"""


def q_row_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group cells back into rows (scan batches arrive row-grouped,
    HBaseParser.java:101-110): one shuffle on row_key, all aggregates
    partial-aggregable.

    fanout (scale-adaptive, guide §2.5): the melt + partial aggregation
    (collect_list + concat_ws per cell) otherwise runs in the fixture's
    single scan task; no-op at real scan parallelism."""
    cells = cells_from_events(spark, sf_dir, fanout=True)
    key = F.concat_ws(":", "family", "qualifier")
    return cells.groupBy("row_key").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("ts_ms").alias("min_ts_ms"),
        F.max("ts_ms").alias("max_ts_ms"),
        F.array_join(F.sort_array(F.collect_list(key)), "|").alias("cell_keys"),
    )


def q_doc_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readDataTree (HBaseParser.java:204-216): cells -> one JSON document per
    row, ``{family: {qualifier: value}}``, keys sorted for determinism.
    Document id = row key (idField unset, :150-153); document ts = the row's
    cell timestamp (:149).

    Runs through the engine's single-shuffle assembly (plans/pipeline.py):
    the oracle-checked parity query exercises the same fold the river tick
    uses in production."""
    from elasticsearch_hbase_river_spark.config import RiverConfig
    from elasticsearch_hbase_river_spark.plans.pipeline import assemble_documents

    # fanout (scale-adaptive, guide §2.5): the melt + JSON assembly is
    # map-side string work feeding one shuffle; behind the fixtures'
    # single-row-group scan it ran in ONE task (r11 A/B: warm 1.1 →
    # 0.8-1.0 s, first-run 2.3 → 1.4 s at sf0.1; no-op at real scale).
    cells = cells_from_events(spark, sf_dir, fanout=True)
    cfg = RiverConfig(table="events", index="river", type_name="doc",
                      column_separator=None, normalize_fields=False)
    return assemble_documents(cells, cfg).select(
        F.col("row_key").alias("doc_id"), "doc_ts_ms", "doc_json")


def q_qualifier_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readQualifierStructure (HBaseParser.java:226-244) in relational form:
    qualifier -> normalized path array (dynamic nesting depth as a path, not
    per-row structs — SURVEY.md §1.4). Exercises separator split, the
    empty-trailing-sub-qualifier collapse, and normalization."""
    # fanout (scale-adaptive, guide §2.5): per-element regex normalization
    # over 4x-melted cells is the CPU cost and ran in the fixture's ONE
    # scan task (r11 A/B: warm 1.7-1.8 → 0.8 s, first-run 5.4 → 1.4 s at
    # sf0.1; the gate adds no exchange at real scan parallelism).
    cells = cells_from_events(spark, sf_dir, fanout=True)
    q2 = F.when(F.col("qualifier") == "props",
                F.concat(F.lit("Data::"), F.upper("qualifier"), F.lit("::"))) \
         .otherwise(F.concat(F.lit("data::"), F.col("qualifier")))
    # Stage the path array as its own projection: it feeds two outputs, and
    # CollapseProject keeps non-cheap multi-referenced expressions staged —
    # inlined, the split/normalize tree is duplicated per consumer and the
    # generated code (and its compile time) roughly triples.
    staged = (cells.select("row_key", "value", q2.alias("qualifier_raw"))
              .select("row_key", "value", "qualifier_raw",
                      split_qualifier_col(F.col("qualifier_raw"), SEP)
                      .alias("path_arr")))
    return staged.select(
        "row_key",
        "qualifier_raw",
        F.array_join("path_arr", "/").alias("path"),
        F.size("path_arr").cast("long").alias("depth"),
        "value",
    )


def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalizeField (HBaseRiver.java:314-326) over synthesized dirty names:
    pure ``lower`` + ``regexp_replace`` — JVM-side, codegen-friendly.

    fanout measured a wash-to-loss here (interleaved A/B r12: ~0.9 s
    both, fanned slightly worse — the projection isn't scan-task-bound),
    so the melt stays unfanned deliberately."""
    cells = cells_from_events(spark, sf_dir)
    raw = F.concat(F.lit("A_"), F.col("qualifier"), F.lit("&*"),
                   F.col("family"), F.lit("::X"))
    return cells.select(
        "row_key", "qualifier",
        raw.alias("raw_name"),
        normalize_field_col(raw, SEP).alias("normalized"),
    )


def q_id_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """findKeyInDataTree (HBaseParser.java:184-194): document id looked up by
    separator path inside the document (path ``data::props``), plus a
    JSON-path extraction of a nested value."""
    cells = cells_from_events(spark, sf_dir)
    return (
        cells.filter((F.col("family") == "data") & (F.col("qualifier") == "props"))
        .select(
            "row_key",
            F.col("value").alias("doc_id_from_path"),
            F.get_json_object("value", "$.k").alias("k_id"),
        )
    )


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert-by-id / latest-version-wins (emergent from
    HBaseParser.java:145-159 + the watermark re-scan): with idField=user_id,
    the newest event per user is the visible document version. The one window
    function in the parity surface; shuffles once on the id key."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts_ms").desc(),
                                              F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("user_id").cast("string").alias("doc_id"),
                "event_id", "ts_ms", "event_type")
    )


_ESC_V = _ESC_SQL.format(v="value")

QUERIES = {
    "q_row_assembly": q_row_assembly,
    "q_doc_pivot": q_doc_pivot,
    "q_qualifier_split": q_qualifier_split,
    "q_normalize": q_normalize,
    "q_id_extract": q_id_extract,
    "q_upsert_latest": q_upsert_latest,
}

ORACLES = {
    "q_row_assembly": f"""{CELLS_CTE}
SELECT row_key,
       count(*) AS n_cells,
       min(ts_ms) AS min_ts_ms,
       max(ts_ms) AS max_ts_ms,
       string_agg(family || ':' || qualifier, '|'
                  ORDER BY family || ':' || qualifier) AS cell_keys
FROM cells GROUP BY row_key""",

    "q_doc_pivot": f"""{CELLS_CTE},
fam AS (
  SELECT row_key, family, min(ts_ms) AS fam_ts,
         '"' || family || '":{{' ||
         string_agg('"' || qualifier || '":"' || {_ESC_V} || '"', ','
                    ORDER BY '"' || qualifier || '":"' || {_ESC_V} || '"')
         || '}}' AS fam_json
  FROM cells GROUP BY row_key, family)
SELECT row_key AS doc_id, min(fam_ts) AS doc_ts_ms,
       '{{' || string_agg(fam_json, ',' ORDER BY fam_json) || '}}' AS doc_json
FROM fam GROUP BY row_key""",

    "q_qualifier_split": f"""{CELLS_CTE},
q2 AS (
  SELECT row_key, value,
         CASE WHEN qualifier = 'props'
              THEN 'Data::' || upper(qualifier) || '::'
              ELSE 'data::' || qualifier END AS qualifier_raw
  FROM cells)
SELECT row_key, qualifier_raw,
       array_to_string({split_qualifier_sql('qualifier_raw', SEP)}, '/') AS path,
       CAST(len({split_qualifier_sql('qualifier_raw', SEP)}) AS BIGINT) AS depth,
       value
FROM q2""",

    "q_normalize": f"""{CELLS_CTE},
r AS (
  SELECT row_key, qualifier,
         'A_' || qualifier || '&*' || family || '::X' AS raw_name
  FROM cells)
SELECT row_key, qualifier, raw_name,
       {normalize_sql('raw_name', SEP)} AS normalized
FROM r""",

    "q_id_extract": f"""{CELLS_CTE}
SELECT row_key,
       value AS doc_id_from_path,
       json_extract_string(value, '$.k') AS k_id
FROM cells WHERE family = 'data' AND qualifier = 'props'""",

    "q_upsert_latest": """
WITH ranked AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
  FROM events)
SELECT CAST(user_id AS VARCHAR) AS doc_id, event_id, ts_ms, event_type
FROM ranked WHERE rn = 1""",
}
