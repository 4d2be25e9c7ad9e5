"""Dataset-curation operators: deterministic splits and per-group selection
(BASELINE.json north star — the operations a large-scale training-data
pipeline needs beyond cleaning/dedup).

- ``q_train_split``: hash-bucket train/valid/test assignment. Content-hash
  based (md5 of the doc id), so the split is stable under reshuffles,
  re-partitioning, and incremental appends — never ``rand()`` (whose
  row-order dependence makes splits irreproducible across runs/plans).
  Map-side only: no shuffle at any scale.
- ``q_group_topk``: top-k rows per group (longest documents per language) —
  the curation "keep the best k per stratum" primitive. One shuffle on the
  group key; the rank prunes before anything downstream materializes.

Both engines compute the hash bucket from the same md5 hex digits, so the
assignment is bit-identical and fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.sources.tables import load_table

#: bucket thresholds over 0..255: ~80% train, ~10% valid, ~10% test
TRAIN_LT = 205
VALID_LT = 230
TOP_K = 5

_HEX = "0123456789abcdef"


def _bucket(col_sql: str) -> F.Column:
    """0..255 from the first two md5 hex digits — portable integer math
    (both engines index into the same hex alphabet)."""
    h = f"md5(CAST({col_sql} AS STRING))"
    return F.expr(
        f"CAST((instr('{_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substr({h}, 2, 1)) - 1) AS BIGINT)")


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/valid/test assignment by content hash of the doc id."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket("doc_id")
    split = (F.when(bucket < TRAIN_LT, "train")
              .when(bucket < VALID_LT, "valid")
              .otherwise("test"))
    return docs.select("doc_id", "lang", bucket.alias("bucket"),
                       split.alias("split"))


def q_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k longest documents per language (deterministic tiebreak on id)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(),
                                           F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra over user cohorts: (purchasers ∩ clickers) ∖ errored —
    INTERSECT/EXCEPT distinct semantics, each leg a pruned scan + distinct;
    Spark plans these as aggregate + semi/anti joins (no sort)."""
    from elasticsearch_hbase_river_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)

    def cohort(t: str):
        return ev.filter(F.col("event_type") == t).select("user_id")

    return (cohort("purchase").intersect(cohort("click"))
            .exceptAll(cohort("error").distinct())
            .select(F.col("user_id").cast("long").alias("user_id")))


QUERIES = {
    "q_train_split": q_train_split,
    "q_group_topk": q_group_topk,
    "q_set_ops": q_set_ops,
}

_B = (f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
      f" + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)")

ORACLES = {
    "q_train_split": f"""
SELECT doc_id, lang, CAST({_B} AS BIGINT) AS bucket,
       CASE WHEN {_B} < {TRAIN_LT} THEN 'train'
            WHEN {_B} < {VALID_LT} THEN 'valid'
            ELSE 'test' END AS split
FROM documents""",

    "q_set_ops": """
SELECT CAST(user_id AS BIGINT) AS user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error'
)""",

    "q_group_topk": f"""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
  FROM documents)
SELECT * FROM ranked WHERE rank <= {TOP_K}""",
}
