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


#: hashing-trick classifier: feature buckets, LCG-derived fixed weights
CLS_B = 1024          # hash buckets (the classifier's weight-vector length)
CLS_A = 1103515245    # LCG multiplier (weights derived from the bucket id)
CLS_C = 12345
CLS_M = 1000003       # prime modulus; weight = wi/M - 0.5 ∈ [-0.5, 0.5)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped quality-classifier INFERENCE at corpus scale: every
    document scored by a linear model over hashing-trick features (word
    unigrams + bigrams → md5 bucket → weight), keep = score > 0. The
    weights here are derived from the bucket id by an LCG so both engines
    synthesize the identical model; a production pipeline broadcasts a
    trained weight vector keyed by the same buckets and ONLY the weight
    lookup changes — the feature plumbing (tokenize → n-gram → hash →
    aggregate) is exactly this plan.

    Determinism: per-feature weights are exact INTEGERS (md5-bucket LCG
    mod a prime); only the final per-doc mean divides — identical operand
    order in both engines, then portable rounding.

    Scale shape: explode → map-side integer hashing → ONE partial-agg
    shuffle on doc_id. No model state on executors beyond the (broadcast)
    weight derivation; at 100 TB this is the same plan as the exact-dedup
    pass."""
    # fanout: the tokenize → n-gram → hash explode is the CPU cost and the
    # fixtures are single-row-group parquet (one scan task regardless of
    # cores) — measured 23-36 s first-run / 2-5 s warm pinned to one core
    # at sf0.1 (guide §2.5 input skew: repartition right after the read)
    docs = (load_table(spark, sf_dir, "documents", fanout=True)
            .select("doc_id", "text"))
    # Materialize the token array as an ATTRIBUTE before the lambda: a
    # computed split() captured inside transform() is re-evaluated per
    # element (the SPARK-36715 pathology class — measured 20× at sf1);
    # a column reference is evaluated once per row.
    toked = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks"))
    toks = F.col("toks")
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat(F.element_at(toks, i), F.lit("_"),
                                       F.element_at(toks, i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    ex = toked.select("doc_id", F.explode(F.concat(toks, bi)).alias("f"))
    bucket = (F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("long")
              % CLS_B)
    wi = (bucket * CLS_A + CLS_C) % CLS_M
    per = (ex.select("doc_id", wi.alias("wi"))
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_feat"),
                F.sum("wi").alias("s")))
    from elasticsearch_hbase_river_spark.functions.determinism import (
        roundn_col,
    )
    score = roundn_col(F.col("s").cast("double") / F.col("n_feat") / CLS_M
                       - 0.5)
    return (per.select("doc_id", "n_feat",
                       score.alias("quality_score"))
            .withColumn("keep", F.col("quality_score") > 0))


QUERIES = {
    "q_train_split": q_train_split,
    "q_group_topk": q_group_topk,
    "q_set_ops": q_set_ops,
    "q_quality_classifier": q_quality_classifier,
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

    "q_quality_classifier": f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS a FROM documents),
feats AS (
  SELECT doc_id,
         unnest(list_concat(a,
                list_transform(range(1, len(a)),
                               i -> a[i] || '_' || a[i + 1]))) AS f
  FROM toks),
w AS (
  SELECT doc_id,
         (('0x' || substr(md5(f), 1, 8))::BIGINT % {CLS_B} * {CLS_A}
          + {CLS_C}) % {CLS_M} AS wi
  FROM feats),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
         CAST(sum(wi) AS BIGINT) AS s
  FROM w GROUP BY doc_id)
SELECT doc_id, n_feat,
       (floor((s::DOUBLE / n_feat / {CLS_M} - 0.5) * 1000000.0 + 0.5)
        / 1000000.0) AS quality_score,
       ((floor((s::DOUBLE / n_feat / {CLS_M} - 0.5) * 1000000.0 + 0.5)
         / 1000000.0) > 0) AS keep
FROM per""",
}
