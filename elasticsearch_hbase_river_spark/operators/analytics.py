"""Event/corpus analytics operators (extension surface — SURVEY.md §2.3,
BASELINE.json north star). The reference computes none of these (its only
aggregate is the sink max-timestamp, SURVEY.md §2.2); they are the product
analytics a training-data/event pipeline runs daily, each shaped for 100 TB:

- ``q_funnel``          : staged conversion funnel (view → click →
  purchase, strictly ordered by time). Three per-user min-aggregates whose
  join keys shrink at every stage — never a row-explosion sequence match.
- ``q_retention``       : day-0 cohort retention (D+1 / D+7). First-touch
  agg + distinct activity join, both keyed on user_id: one shuffle each.
- ``q_running_total``   : per-user cumulative spend + inter-event gap —
  window pass, exact DECIMAL accumulation.
- ``q_histogram``       : fixed-width value histogram per event type —
  pure map-side bucketing + one partial-agg shuffle.
- ``q_json_extract``    : typed extraction from a JSON string column
  (``props``) with per-type aggregation — schema-on-read without a UDF.
- ``q_stratified_sample``: per-stratum deterministic hash sampling at
  different rates (downsample dominant language) — map-side only, stable
  under reshuffles/appends, never ``rand()``.
- ``q_cooccurrence``    : token pair co-occurrence over documents. The
  pair blow-up is bounded by a top-V vocabulary (computed first, then
  BROADCAST into the pair self-join) so the quadratic term is V², not
  tokens² — the standard trick that keeps this runnable at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import roundn_col, roundn_sql
from elasticsearch_hbase_river_spark.operators.curation import _bucket, _HEX
from elasticsearch_hbase_river_spark.operators.rollup import SESSION_GAP_MS
from elasticsearch_hbase_river_spark.sources.tables import load_events, load_table

DAY_MS = 86_400_000
HIST_WIDTH = 5.0
VOCAB_V = 40
MIN_TOKEN_LEN = 4
#: per-language sampling thresholds over the 0..255 md5 bucket space:
#: keep ~12.5% of 'en' (the dominant stratum), ~50% of everything else.
EN_LT, OTHER_LT = 32, 128


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked after their first
    view, then purchased after that first click. Single summary row."""
    ev = load_events(spark, sf_dir)

    def stage(t: str):
        return ev.filter(F.col("event_type") == t).select("user_id", "ts_ms")

    v = stage("view").groupBy("user_id").agg(F.min("ts_ms").alias("t_view"))
    c = (stage("click").join(v, "user_id")
         .filter(F.col("ts_ms") > F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts_ms").alias("t_click")))
    p = (stage("purchase").join(c, "user_id")
         .filter(F.col("ts_ms") > F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts_ms").alias("t_purchase")))
    return (v.agg(F.count(F.lit(1)).alias("n_view"))
            .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
            .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase"))))


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+1 / D+7 retention per first-activity cohort day."""
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts_ms div {DAY_MS}").alias("day")
    act = ev.select("user_id", day).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(first, "user_id")
        .groupBy("cohort_day")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(
                F.when(F.col("day") == F.col("cohort_day") + 1, F.col("user_id"))
            ).alias("n_d1"),
            F.countDistinct(
                F.when(F.col("day") == F.col("cohort_day") + 7, F.col("user_id"))
            ).alias("n_d7"),
        )
    )


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running spend and gap to the previous event. One window
    shuffle on user_id; the cumulative sum is exact DECIMAL."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = F.col("value").cast("decimal(18,2)")
    return ev.select(
        "event_id", "user_id", "ts_ms",
        F.row_number().over(w).cast("long").alias("event_seq"),
        roundn_col(F.sum(dec).over(wrun).cast("double")).alias("cum_value"),
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per type."""
    ev = load_events(spark, sf_dir)
    bucket = F.floor(F.col("value") / F.lit(HIST_WIDTH)).cast("long")
    return (ev.groupBy("event_type", bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n")))


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the ``props`` JSON column: extract ``$.k`` as a
    long, aggregate per event type — built-in JSON path, no UDF."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("k").alias("n_with_k"),
             F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling of documents (md5-bucket,
    same portable integer math as ``q_train_split``)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket("doc_id")
    keep = F.when(F.col("lang") == "en", bucket < EN_LT).otherwise(bucket < OTHER_LT)
    return (docs.select("doc_id", "lang", bucket.alias("bucket"))
                .filter(keep))


def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document co-occurrence counts for the top-V vocabulary: distinct
    (doc, token) pairs filtered to a broadcast vocab, then a within-doc
    self-join (a.token < b.token). Bounded: ≤ V(V-1)/2 output rows and
    ≤ V per-doc join fan-out regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id",
                    F.explode(F.array_distinct(F.split("text", " "))).alias("token"))
        .filter(F.length("token") >= MIN_TOKEN_LEN)
    )
    # Two-phase top-V (TakeOrderedAndProject) — the full vocabulary never
    # funnels through a single-partition window; only V survivors remain.
    vocab = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.col("cnt").desc(), F.col("token")).limit(VOCAB_V)
             .select("token"))
    vt = toks.join(F.broadcast(vocab), "token")
    a = vt.alias("a")
    b = vt.alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
               & (F.col("a.token") < F.col("b.token")))
        .groupBy(F.col("a.token").alias("token_a"),
                 F.col("b.token").alias("token_b"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


Z_THRESHOLD = 3.0


def q_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging per event type. The per-type stats relation
    is k rows (k = #types) — computed in one partial-agg pass and BROADCAST
    back into the scan, so the fact table is read once and never shuffled
    on a stats key."""
    ev = load_events(spark, sf_dir)
    stats = (ev.groupBy("event_type")
             .agg(F.avg("value").alias("mu"),
                  F.stddev_samp("value").alias("sigma")))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type",
                roundn_col(F.col("value")).alias("value"),
                roundn_col(z).alias("z"))
        .withColumn("is_anomaly", F.abs(F.col("z")) >= Z_THRESHOLD)
    )


def q_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: purchases attributed to the gap-session they
    fall inside. Equi key (user_id) carries the join; the time-range
    predicate filters within matches — never a cross join. Per-session
    purchase counts and exact DECIMAL spend."""
    from elasticsearch_hbase_river_spark.operators.rollup import q_sessionize

    sessions = q_sessionize(spark, sf_dir)
    purchases = (load_events(spark, sf_dir)
                 .filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts_ms",
                         F.col("value").cast("decimal(18,2)").alias("dec_v")))
    j = sessions.join(
        purchases,
        (sessions.user_id == purchases.user_id)
        & (purchases.ts_ms >= sessions.session_start_ms)
        & (purchases.ts_ms <= sessions.session_end_ms),
        "left")
    return (
        j.groupBy(sessions.user_id, "session_idx",
                  "session_start_ms", "session_end_ms")
        .agg(F.count(purchases.ts_ms).alias("n_purchases"),
             F.sum("dec_v").alias("spend_dec"))
        .select(sessions.user_id.alias("user_id"), "session_idx",
                "session_start_ms", "session_end_ms", "n_purchases",
                roundn_col(F.coalesce(F.col("spend_dec"),
                                      F.lit(0).cast("decimal(18,2)"))
                           .cast("double")).alias("purchase_value"))
    )


def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h per-user activity via a RANGE window frame (value-based,
    peers included — a different frame class from the ROWS frames
    elsewhere). One shuffle on user_id; the frame scan is linear per
    partition with Spark's sliding aggregation."""
    ev = load_events(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts_ms")
         .rangeBetween(-DAY_MS, 0))
    dec = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1)).over(w)
    return ev.select(
        "event_id", "user_id", "ts_ms",
        n.cast("long").alias("n_24h"),
        roundn_col(F.sum(dec).over(w).cast("double")).alias("sum_24h"),
        roundn_col(F.sum(dec).over(w).cast("double") / n).alias("avg_24h"),
    )


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per event type: HyperLogLog++ distinct users and
    approximate percentiles — the 100 TB substitutes for exact
    countDistinct / sort-based quantiles (fixed-size sketch state, one
    partial-agg shuffle, no global sort). Approximation is engine-specific,
    so this is a rows-only query; ``test_approx_stats_within_bounds`` pins
    the error against the exact twins instead."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"),
             F.percentile_approx("value", 0.5).alias("approx_p50"),
             F.percentile_approx("value", 0.95).alias("approx_p95"),
             F.count(F.lit(1)).alias("n_events"))
    )


QUERIES = {
    "q_funnel": q_funnel,
    "q_retention": q_retention,
    "q_running_total": q_running_total,
    "q_histogram": q_histogram,
    "q_json_extract": q_json_extract,
    "q_stratified_sample": q_stratified_sample,
    "q_cooccurrence": q_cooccurrence,
    "q_anomaly": q_anomaly,
    "q_session_attribution": q_session_attribution,
    "q_trailing_window": q_trailing_window,
    "q_approx_stats": q_approx_stats,  # rows-only: sketches are engine-specific
}

_B_DOC = (f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
          f" + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)")

ORACLES = {
    "q_funnel": """
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
v AS (SELECT user_id, min(ts_ms) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts_ms) AS t_click
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts_ms > v.t_view
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts_ms) AS t_purchase
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts_ms > c.t_click
      GROUP BY e.user_id)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click,
       (SELECT count(*) FROM p) AS n_purchase""",

    "q_retention": f"""
WITH act AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // {DAY_MS} AS day FROM events),
first AS (
  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
SELECT f.cohort_day,
       count(DISTINCT a.user_id) AS n_users,
       count(DISTINCT CASE WHEN a.day = f.cohort_day + 1 THEN a.user_id END)
         AS n_d1,
       count(DISTINCT CASE WHEN a.day = f.cohort_day + 7 THEN a.user_id END)
         AS n_d7
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort_day""",

    "q_running_total": f"""
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
         CAST(value AS DECIMAL(18,2)) AS dec_v
  FROM events)
SELECT event_id, user_id, ts_ms,
       CAST(row_number() OVER w AS BIGINT) AS event_seq,
       {roundn_sql('''(sum(dec_v) OVER (PARTITION BY user_id
            ORDER BY ts_ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE''')}
         AS cum_value,
       ts_ms - lag(ts_ms) OVER w AS gap_ms
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)""",

    "q_histogram": f"""
SELECT event_type, CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket,
       count(*) AS n
FROM events GROUP BY 1, 2""",

    "q_json_extract": """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM e GROUP BY event_type""",

    "q_stratified_sample": f"""
SELECT doc_id, lang, CAST({_B_DOC} AS BIGINT) AS bucket
FROM documents
WHERE CASE WHEN lang = 'en' THEN {_B_DOC} < {EN_LT}
           ELSE {_B_DOC} < {OTHER_LT} END""",

    "q_anomaly": f"""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       {roundn_sql('e.value')} AS value,
       {roundn_sql('(e.value - s.mu) / s.sigma')} AS z,
       abs({roundn_sql('(e.value - s.mu) / s.sigma')}) >= {Z_THRESHOLD}
         AS is_anomaly
FROM events e JOIN stats s ON e.event_type = s.event_type""",

    "q_session_attribution": f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
flagged AS (
  SELECT user_id, event_id, ts_ms,
         CASE WHEN lag(ts_ms) OVER w IS NULL
                   OR ts_ms - lag(ts_ms) OVER w > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
s AS (
  SELECT user_id, ts_ms,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged),
sessions AS (
  SELECT user_id, session_idx,
         min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms
  FROM s GROUP BY user_id, session_idx),
p AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, CAST(value AS DECIMAL(18,2)) AS dec_v
  FROM events WHERE event_type = 'purchase')
SELECT se.user_id, se.session_idx, se.session_start_ms, se.session_end_ms,
       count(p.ts_ms) AS n_purchases,
       {roundn_sql("coalesce(sum(p.dec_v), CAST(0 AS DECIMAL(18,2)))::DOUBLE")}
         AS purchase_value
FROM sessions se
LEFT JOIN p ON p.user_id = se.user_id
           AND p.ts_ms BETWEEN se.session_start_ms AND se.session_end_ms
GROUP BY se.user_id, se.session_idx, se.session_start_ms, se.session_end_ms""",

    "q_trailing_window": f"""
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
         CAST(value AS DECIMAL(18,2)) AS dec_v
  FROM events)
SELECT event_id, user_id, ts_ms,
       CAST(count(*) OVER w AS BIGINT) AS n_24h,
       {roundn_sql('(sum(dec_v) OVER w)::DOUBLE')} AS sum_24h,
       {roundn_sql('(sum(dec_v) OVER w)::DOUBLE / count(*) OVER w')} AS avg_24h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
             RANGE BETWEEN {DAY_MS} PRECEDING AND CURRENT ROW)""",

    "q_cooccurrence": f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  WHERE length(t.token) >= {MIN_TOKEN_LEN}),
vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS r
    FROM toks GROUP BY token)
  WHERE r <= {VOCAB_V}),
vt AS (SELECT doc_id, token FROM toks JOIN vocab USING (token))
SELECT a.token AS token_a, b.token AS token_b, count(*) AS n_docs
FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY 1, 2""",
}
