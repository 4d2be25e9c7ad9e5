"""CCNet-style corpus cleaning: line-level cross-document dedup and the
perplexity tercile split.

The published CommonCrawl curation recipe (CCNet; also the Gopher /
RefinedWeb pipelines) cleans in two passes the existing dedup family
doesn't cover:

- ``q_line_dedup``        : LINE-level dedup across the whole corpus —
  every line's hash is ranked globally and only the FIRST occurrence
  (smallest ``(doc_id, line_no)``) survives; boilerplate that repeats
  across pages disappears from every later page. Reported per document:
  lines kept and the retained ratio — the signal CCNet uses to then drop
  gutted documents. The fixture corpus has no newline structure, so a
  "line" is a non-overlapping {LINE_TOKENS}-token window (the same
  convention as ``q_passage_dedup``, pretrain.py:72 — which only REPORTS
  colliding windows; this operator applies the keep-first rule and
  scores the documents).
- ``q_perplexity_filter`` : CCNet's head/middle/tail split — documents
  bucketed by the TERCILES of their own LM score (mean add-one-smoothed
  unigram log-prob, the ``q_unigram_logprob`` signal re-used as a
  filter). "head" = best-scoring third (lowest perplexity). Cut points
  and per-doc scores are rounded with the portable primitive BEFORE the
  comparison so the bucket boundaries cannot diverge between engines.

Scale shapes: line dedup is one explode (corpus x lines/doc) into a
hash-keyed window — rank-1-of-group, the exact-dedup shuffle shape, with
map-side partial work and no pairwise expansion; the per-doc rollup
rides a second keyed shuffle on doc_id. The perplexity split builds the
vocab-sized LM once (broadcast back), scores in one doc_id-keyed pass,
and the tercile cut is a 1-row broadcast aggregate over the per-doc
relation — nothing corpus-sized crosses the driver. At 100 TB both are
linear scans plus hash shuffles; the line-hash relation is the biggest
intermediate and it shrinks with dedup rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import (
    roundn_col,
    roundn_sql,
)
from elasticsearch_hbase_river_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

LINE_TOKENS = 10          # tokens per synthetic "line" (no \n in fixture)
_TOKS_SQL = "string_split(text, ' ')"

# ---------------------------------------------------------------------------
# Line-level cross-document dedup (keep first occurrence globally).


def _lines(docs: DataFrame) -> DataFrame:
    """(doc_id, line_no, line_hash): non-overlapping {LINE_TOKENS}-token
    windows, hashed. One map-side pass — tokenize, slice, md5 — feeding
    the explode; nothing here shuffles."""
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    n_lines = F.ceil(F.size("toks") / LINE_TOKENS).cast("int")
    return t.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.md5(F.concat_ws(
                " ", F.slice(F.col("toks"), i * LINE_TOKENS + 1,
                             LINE_TOKENS))),
        )).alias("line_no", "line_hash"),
    ).select("doc_id", F.col("line_no").cast("long").alias("line_no"),
             "line_hash")


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet line dedup applied: a line survives iff it is the globally
    FIRST occurrence of its hash (smallest ``(doc_id, line_no)``).
    Per document: total lines, kept lines, 4-dp retained ratio.

    Scale shape: one hash-keyed rank window (= the exact-dedup shuffle)
    then one doc_id rollup; no pairwise work anywhere."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lines = _lines(docs)
    w = Window.partitionBy("line_hash").orderBy("doc_id", "line_no")
    kept = lines.withColumn("rn", F.row_number().over(w))
    per = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long").alias("n_kept"))
    return per.select(
        "doc_id", "n_lines", "n_kept",
        roundn_col(F.col("n_kept") / F.col("n_lines"), 4)
        .alias("retained_ratio"))


ORACLES["q_line_dedup"] = f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             range(0, CAST(ceil(len(toks) / {LINE_TOKENS}.0) AS BIGINT))
               AS idx
      FROM t),
lines AS (
  SELECT doc_id,
         CAST(unnest(idx) AS BIGINT) AS line_no,
         unnest(list_transform(idx, i -> md5(array_to_string(
           toks[i * {LINE_TOKENS} + 1 : (i + 1) * {LINE_TOKENS}],
           ' ')))) AS line_hash
  FROM n),
ranked AS (
  SELECT doc_id, line_no,
         row_number() OVER (PARTITION BY line_hash
                            ORDER BY doc_id, line_no) AS rn
  FROM lines)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
       {roundn_sql('count(*) FILTER (rn = 1) / count(*)::DOUBLE', 4)}
       AS retained_ratio
FROM ranked GROUP BY doc_id"""

# ---------------------------------------------------------------------------
# Perplexity tercile split (head / middle / tail).


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: per-doc mean unigram log-prob
    (the ``q_unigram_logprob`` signal, text.py:200), then docs are
    bucketed by the corpus TERCILES of that score — "head" is the
    best-scoring (lowest-perplexity) third. Scores and cut points are
    rounded BEFORE comparison so the boundaries are engine-exact.
    Output: one row per bucket with doc count, token mass and mean
    score — the mix report a curation run logs before choosing what to
    train on."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " "))
                      .alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = freq.agg(F.sum("cnt").alias("total"),
                      F.count(F.lit(1)).alias("vocab"))
    logp = F.log((F.col("cnt") + 1.0)
                 / (F.col("total") + F.col("vocab")).cast("double"))
    per_doc = (tok.join(F.broadcast(freq), "token")
               .crossJoin(F.broadcast(totals))
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                    roundn_col(F.avg(logp)).alias("alp")))
    # 1e0/3e0: e-notation parses as DOUBLE in both dialects — a bare
    # `1.0/3.0` runs limited-scale DECIMAL division (the esdsl3 geo note)
    cuts = per_doc.agg(
        roundn_col(F.expr("percentile(alp, 1e0/3e0)")).alias("t1"),
        roundn_col(F.expr("percentile(alp, 2e0/3e0)")).alias("t2"))
    bucket = (F.when(F.col("alp") > F.col("t2"), "head")
              .when(F.col("alp") > F.col("t1"), "middle")
              .otherwise("tail"))
    return (per_doc.crossJoin(F.broadcast(cuts))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 roundn_col(F.avg("alp")).alias("avg_logprob"))
            .orderBy("bucket"))


ORACLES["q_perplexity_filter"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
totals AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM freq),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         {roundn_sql('avg(ln((cnt + 1.0) / (total + vocab)))')} AS alp
  FROM tok JOIN freq USING (token), totals
  GROUP BY doc_id),
cuts AS (
  SELECT {roundn_sql('quantile_cont(alp, 1e0/3e0)')} AS t1,
         {roundn_sql('quantile_cont(alp, 2e0/3e0)')} AS t2
  FROM per_doc)
SELECT CASE WHEN alp > t2 THEN 'head'
            WHEN alp > t1 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       {roundn_sql('avg(alp)')} AS avg_logprob
FROM per_doc, cuts GROUP BY 1 ORDER BY 1"""

# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al., "Data Selection for Language
# Models via Importance Resampling").

DSIR_TARGET_SRC = "src0"   # the "high-quality domain" defining p_target
DSIR_TOP = 50


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: score every document by how much it
    looks like a TARGET domain rather than the raw corpus —
    ``log w(doc) = Σ_tok tf(tok) · ln(p_target(tok) / p_corpus(tok))``
    with add-one smoothing on both unigram LMs (the hashed-ngram
    feature model of the paper, with the fixture's small vocabulary
    standing in for the hash buckets). Target = the {DSIR_TARGET_SRC!r}
    source. Top-{DSIR_TOP} docs by weight — the resampling keep-list's
    head.

    Scale shape: both LMs are vocab-sized aggregates broadcast back;
    the corpus is tokenized ONCE and the score is one doc_id-keyed
    partial-agg shuffle. Importance resampling at 100 TB is exactly
    this: two tiny LMs, one linear scoring pass."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "source",
                      F.explode(F.split("text", " ")).alias("token"))
    corpus = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("c_cnt"))
    target = (tok.filter(F.col("source") == DSIR_TARGET_SRC)
              .groupBy("token").agg(F.count(F.lit(1)).alias("t_cnt")))
    lm = corpus.join(target, "token", "left").select(
        "token", "c_cnt", F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"))
    totals = lm.agg(F.sum("c_cnt").alias("c_total"),
                    F.sum("t_cnt").alias("t_total"),
                    F.count(F.lit(1)).alias("vocab"))
    ratio = F.log(
        ((F.col("t_cnt") + 1.0) / (F.col("t_total") + F.col("vocab")))
        / ((F.col("c_cnt") + 1.0) / (F.col("c_total") + F.col("vocab"))))
    scored = (tok.join(F.broadcast(lm), "token")
              .crossJoin(F.broadcast(totals))
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                   roundn_col(F.sum(ratio)).alias("log_weight")))
    return (scored.orderBy(F.col("log_weight").desc(), "doc_id")
            .limit(DSIR_TOP))


ORACLES["q_dsir_weights"] = f"""
WITH tok AS (
  SELECT doc_id, source, unnest({_TOKS_SQL}) AS token FROM documents),
corpus AS (SELECT token, count(*) AS c_cnt FROM tok GROUP BY token),
target AS (SELECT token, count(*) AS t_cnt FROM tok
           WHERE source = '{DSIR_TARGET_SRC}' GROUP BY token),
lm AS (
  SELECT token, c_cnt, coalesce(t_cnt, 0) AS t_cnt
  FROM corpus LEFT JOIN target USING (token)),
totals AS (SELECT sum(c_cnt) AS c_total, sum(t_cnt) AS t_total,
                  count(*) AS vocab FROM lm),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         {roundn_sql('''sum(ln(((t_cnt + 1.0) / (t_total + vocab))
                        / ((c_cnt + 1.0) / (c_total + vocab))))''')}
         AS log_weight
  FROM tok JOIN lm USING (token), totals
  GROUP BY doc_id)
SELECT * FROM scored ORDER BY log_weight DESC, doc_id LIMIT {DSIR_TOP}"""

# ---------------------------------------------------------------------------

QUERIES.update({
    "q_line_dedup": q_line_dedup,
    "q_perplexity_filter": q_perplexity_filter,
    "q_dsir_weights": q_dsir_weights,
})
