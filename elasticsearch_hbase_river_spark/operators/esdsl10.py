"""ES DSL pack 10 (round 8): learned-sparse retrieval, TSDB series
aggregation, similarity-cutoff kNN.

Closes the last ES-8.x query-surface gaps the packs 1–9 audit left open:

- ``sparse_vector`` — the ELSER/SPLADE-era learned-sparse query: documents
  carry (token → weight) feature maps, the query carries weighted terms,
  and the score is the dot product over overlapping tokens. The engine
  derives deterministic doc-side weights (tf × idf over the analyzed
  corpus) so both engines synthesize identical features; a production
  pipeline lands model-emitted weights in the same (doc_id, token,
  weight) relation and the query is unchanged — which is the point:
  learned-sparse serving IS a weighted postings join.
- ``time_series`` aggregation — ES TSDB's per-series rollup: series are
  keyed by the dimension set, metrics are stream-order-latest values and
  per-series rates. Dimension key here: ``user_id`` over ``events``.
- ``knn`` with ``similarity`` cutoff — ES's radius form of the vector
  query: every neighbor above a cosine threshold, not a fixed top-k.

Reference parity: the reference ships rows to ES and lets ES answer these
(`HBaseParser.java:135-162` is the index side); the engine answers them
relationally. Scale notes per query docstring; plan-shape audited like
every other registered query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import (
    roundn_col,
    roundn_sql,
)
from elasticsearch_hbase_river_spark.operators.search import (
    _POSTINGS_SQL,
    _postings,
)
from elasticsearch_hbase_river_spark.operators.similarity import (
    _dot,
    _dot_sql,
    _norm,
    _norm_sql,
)
from elasticsearch_hbase_river_spark.sources.tables import load_events, load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# sparse_vector — weighted-term (learned-sparse) retrieval.

#: The weighted query: (term, weight) — the shape a sparse encoder emits.
SPARSE_QUERY = (("spark", 2.0), ("window", 1.0), ("merge", 1.5))
SPARSE_TOP = 20


def q_sparse_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``sparse_vector`` query: score = Σ_t q_weight(t) · doc_weight(t)
    over the overlapping tokens, doc weights tf·idf-derived
    (idf = ln(1 + N/df)), top-{SPARSE_TOP} by score.

    Scale shape: ONE corpus tokenization; the term filter sits below the
    (doc, token) partial-agg shuffle so only query-term occurrences
    shuffle; df and N are a broadcast |terms|-row and 1-row aggregate; the
    ranking is TakeOrderedAndProject. With model-emitted weights stored as
    a postings-shaped relation this is a pruned index read instead — the
    serving cost is the weighted postings join either way."""
    docs = load_table(spark, sf_dir, "documents")
    terms = tuple(t for t, _ in SPARSE_QUERY)
    qw = F.create_map(
        *[x for t, w in SPARSE_QUERY for x in (F.lit(t), F.lit(w))])
    tf = (_postings(docs)
          .filter(F.col("token").isin(*terms))
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    dfr = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    idf = F.log(F.lit(1.0) + F.col("n_docs") / F.col("df"))
    contrib = qw.getItem(F.col("token")) * F.col("tf") * idf
    per_doc = (tf.join(F.broadcast(dfr), "token")
               .crossJoin(F.broadcast(n_docs))
               .groupBy("doc_id")
               .agg(roundn_col(F.sum(contrib)).alias("score")))
    top = (per_doc.orderBy(F.col("score").desc(), F.col("doc_id"))
           .limit(SPARSE_TOP))
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


QUERIES["q_sparse_vector"] = q_sparse_vector

_SPARSE_TERMS_SQL = ", ".join(f"'{t}'" for t, _ in SPARSE_QUERY)
_SPARSE_QW_SQL = ("CASE token "
                  + " ".join(f"WHEN '{t}' THEN {w}"
                             for t, w in SPARSE_QUERY)
                  + " END")

ORACLES["q_sparse_vector"] = f"""
WITH tok AS ({_POSTINGS_SQL}),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ({_SPARSE_TERMS_SQL}) GROUP BY doc_id, token),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
scored AS (
  SELECT doc_id,
         {roundn_sql(f"sum(({_SPARSE_QW_SQL}) * tf"
                     " * ln(1.0 + n.n_docs / dfr.df))")} AS score
  FROM tf JOIN dfr USING (token), n GROUP BY doc_id),
ranked AS (
  SELECT doc_id, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
  FROM scored)
SELECT * FROM ranked WHERE rank <= {SPARSE_TOP}"""

# ---------------------------------------------------------------------------
# time_series aggregation — TSDB per-series rollup.

TS_TOP_SERIES = 20


def q_time_series_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES TSDB ``time_series`` aggregation: series keyed by the dimension
    set (``user_id``), per series the doc count, the STREAM-ORDER-latest
    value (ties on ts break by event_id — the TSDB ``last_value``
    contract), the series time span, and the mean value rate per hour of
    span. Top-{TS_TOP_SERIES} series by count.

    Scale shape: one shuffle keyed on the series dimension with partial
    aggregation (``max_by`` on the (ts, event_id) stream key carries the
    latest value map-side); the ranking runs over the |series| relation,
    never the events."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", "ts_ms",
        F.col("value").cast("decimal(18,2)").alias("value"))
    per = (ev.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.max_by("value", F.struct("ts_ms", "event_id"))
                .alias("last_value"),
                (F.max("ts_ms") - F.min("ts_ms")).alias("span_ms"),
                F.sum("value").alias("value_sum")))
    rate = F.when(
        F.col("span_ms") > 0,
        roundn_col(F.col("value_sum").cast("double")
                   / (F.col("span_ms") / F.lit(3_600_000.0)))
    ).otherwise(F.lit(None).cast("double"))
    return (per.select("user_id", "n_docs",
                       F.col("last_value").cast("double")
                       .alias("last_value"),
                       "span_ms", rate.alias("value_per_hour"))
            .orderBy(F.col("n_docs").desc(), "user_id")
            .limit(TS_TOP_SERIES))


QUERIES["q_time_series_agg"] = q_time_series_agg

ORACLES["q_time_series_agg"] = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CAST(value AS DECIMAL(18,2)) AS value
  FROM events),
last AS (
  SELECT user_id, value AS last_value FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts_ms DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1),
per AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         max(ts_ms) - min(ts_ms) AS span_ms,
         sum(value) AS value_sum
  FROM ev GROUP BY user_id
),
per2 AS (SELECT * FROM per JOIN last USING (user_id))
SELECT user_id, n_docs, last_value::DOUBLE AS last_value, span_ms,
       CASE WHEN span_ms > 0
            THEN {roundn_sql('value_sum::DOUBLE / (span_ms / 3600000.0)')}
            END AS value_per_hour
FROM per2 ORDER BY n_docs DESC, user_id LIMIT {TS_TOP_SERIES}"""

# ---------------------------------------------------------------------------
# knn with a similarity cutoff — the radius form of the vector query.

KNN_SIM_QVEC = 0
KNN_SIM_THRESHOLD = 0.55


def q_knn_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``knn`` with ``similarity``: EVERY neighbor whose cosine clears
    the threshold, not a fixed top-k — the radius query alerting and
    dedup pipelines use when result count must follow data density.

    Scale shape: one corpus scan, the query vector broadcast, the
    threshold applied map-side (no ranking window at all — output size is
    data-dependent by design)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == KNN_SIM_QVEC).select(
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qnorm"))
    cos = roundn_col(_dot(F.col("qe"), F.col("embedding"))
                     / (F.col("qnorm") * _norm(F.col("embedding"))))
    return (emb.filter(F.col("vec_id") != KNN_SIM_QVEC)
            .crossJoin(F.broadcast(qv))
            .select(F.col("vec_id").alias("doc_id"), cos.alias("cosine"))
            .filter(F.col("cosine") >= KNN_SIM_THRESHOLD))


QUERIES["q_knn_similarity"] = q_knn_similarity

ORACLES["q_knn_similarity"] = f"""
WITH qv AS (
  SELECT embedding AS qe, {_norm_sql('embedding')} AS qnorm
  FROM embeddings WHERE vec_id = {KNN_SIM_QVEC}),
scored AS (
  SELECT vec_id AS doc_id,
         {roundn_sql(_dot_sql('qe', 'embedding')
                     + " / (qnorm * " + _norm_sql('embedding') + ")")}
           AS cosine
  FROM embeddings, qv
  WHERE vec_id <> {KNN_SIM_QVEC})
SELECT * FROM scored WHERE cosine >= {KNN_SIM_THRESHOLD}"""

# ---------------------------------------------------------------------------
# rank_vectors — late-interaction (ColBERT-style) maxSim scoring.

MAXSIM_QVEC = 0          # the query document's vec_id
MAXSIM_TOKENS = 8        # token vectors per document
MAXSIM_DIM = 8           # dims per token vector (8 × 8 = fixture dim 64)
MAXSIM_TOP = 20


def q_rank_vectors_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rank_vectors`` + ``maxSimDotProduct``: late-interaction
    retrieval, where each document carries a BAG of token vectors and the
    score is Σ over query tokens of the max dot product against any doc
    token (the ColBERT scoring rule ES 8.16 exposes as rank_vectors).
    Token vectors here are derived by slicing the fixture's 64-dim
    embedding into {MAXSIM_TOKENS} × {MAXSIM_DIM}-dim chunks — a
    production pipeline lands model-emitted multi-vectors in the same
    array layout and the query is unchanged. Top-{MAXSIM_TOP} by score.

    Scale shape: the 1-row query side is a broadcast; the maxSim is
    computed PER ROW with nested higher-order functions (a bounded
    {MAXSIM_TOKENS}×{MAXSIM_TOKENS}×{MAXSIM_DIM}-op expression — no
    explode, no token-level shuffle, no state); the only exchange is the
    final TakeOrderedAndProject. At 100 TB this is a single map pass over
    the corpus, which is exactly what brute-force late interaction costs;
    the IVF/LSH index path (`vector_index.py`) prunes candidates when a
    coarse quantizer is warranted."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = (emb.filter(F.col("vec_id") == MAXSIM_QVEC)
          .select(F.col("embedding").alias("qe")))
    t, d = MAXSIM_TOKENS, MAXSIM_DIM
    maxsim = F.expr(f"""
      aggregate(sequence(0, {t - 1}), cast(0.0 as double), (acc, i) ->
        acc + array_max(transform(sequence(0, {t - 1}), j ->
          aggregate(sequence(1, {d}), cast(0.0 as double), (a2, k) ->
            a2 + cast(element_at(qe, i * {d} + k) as double)
               * cast(element_at(embedding, j * {d} + k) as double)))))
    """)
    scored = (emb.filter(F.col("vec_id") != MAXSIM_QVEC)
              .crossJoin(F.broadcast(qv))
              .select("vec_id", roundn_col(maxsim).alias("max_sim")))
    # orderBy().limit() folds to TakeOrderedAndProject (two-phase partial
    # top-k); the rank window then runs over the ≤k survivors only —
    # never a corpus-wide single-partition sort
    top = (scored.orderBy(F.col("max_sim").desc(), "vec_id")
           .limit(MAXSIM_TOP))
    w = Window.orderBy(F.col("max_sim").desc(), "vec_id")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


QUERIES["q_rank_vectors_maxsim"] = q_rank_vectors_maxsim

_MAXSIM_DOT = ("list_sum(list_transform(range(1, {d} + 1), k -> "
               "qe[i * {d} + k]::DOUBLE * embedding[j * {d} + k]::DOUBLE))"
               .format(d=MAXSIM_DIM))

ORACLES["q_rank_vectors_maxsim"] = f"""
WITH qv AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = {MAXSIM_QVEC}),
scored AS (
  SELECT vec_id,
         {roundn_sql(
             f"list_sum(list_transform(range(0, {MAXSIM_TOKENS}), i -> "
             f"list_max(list_transform(range(0, {MAXSIM_TOKENS}), j -> "
             f"{_MAXSIM_DOT}))))")} AS max_sim
  FROM embeddings, qv WHERE vec_id <> {MAXSIM_QVEC}),
ranked AS (
  SELECT vec_id, max_sim,
         CAST(row_number() OVER (ORDER BY max_sim DESC, vec_id) AS BIGINT)
           AS rank
  FROM scored)
SELECT * FROM ranked WHERE rank <= {MAXSIM_TOP}"""
