"""Event-stream rollup operators (SURVEY.md §2.3 E6-E8).

- ``q_event_rollup`` : hourly × event-type aggregate — groupBy on a derived
  time bucket; partial-aggregated; at 100 TB the bucket aligns with date
  partitioning so the shuffle is the only data movement.
- ``q_sessionize``   : gap-based sessionization (30-min) — batch twin of
  streaming ``session_window``: lag + running sum, one shuffle on user_id.
- ``q_enrich_join``  : fact × dimensions star join — dimensions broadcast,
  no fact shuffle before the aggregate.

Money-typed aggregates go through DECIMAL(18,2) so the sums are exact and
order-independent (double summation order is NOT deterministic across
engines or even across Spark runs); the final cast to double is a single
deterministic op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import roundn_col, roundn_sql
from elasticsearch_hbase_river_spark.sources.tables import load_events, load_table

SESSION_GAP_MS = 30 * 60 * 1000


def q_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum/avg/distinct-users by (hour, event_type)."""
    ev = load_events(spark, sf_dir)
    hour_ms = F.expr("(ts_ms div 3600000) * 3600000")
    dec = F.col("value").cast("decimal(18,2)")
    return (
        ev.groupBy(hour_ms.alias("hour_ms"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(dec).alias("sum_dec"),
        )
        .select(
            "hour_ms", "event_type", "n_events", "n_users",
            roundn_col(F.col("sum_dec").cast("double")).alias("sum_value"),
            roundn_col(F.col("sum_dec").cast("double") / F.col("n_events"))
                .alias("avg_value"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user: new session when the gap to the previous
    event exceeds 30 min; emit per-session envelope."""
    ev = load_events(spark, sf_dir)
    order = [F.col("ts_ms"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flag = F.when(
        F.lag("ts_ms").over(w).isNull()
        | ((F.col("ts_ms") - F.lag("ts_ms").over(w)) > SESSION_GAP_MS), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_sess", flag)
        .withColumn("session_idx", F.sum("new_sess").over(wrun).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts_ms").alias("session_start_ms"),
             F.max("ts_ms").alias("session_end_ms"),
             F.count(F.lit(1)).alias("n_events"))
    )


def q_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dimension enrichment: orders × customer × nation, revenue by
    nation. Dimensions explicitly broadcast (star-join shape)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.join(F.broadcast(customer),
                    orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.countDistinct("o_custkey").alias("n_customers"),
             F.sum(dec).alias("rev_dec"))
        .select("n_name", "n_orders", "n_customers",
                roundn_col(F.col("rev_dec").cast("double")).alias("revenue"))
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (events self-attribution): for each event, the user's most
    recent PRIOR purchase event — the temporal join every training-data
    pipeline needs (label attribution, point-in-time features).

    Spark-first shape: NOT a range join (which explodes into an inequality
    join) but a single window pass — partition by user, order by time,
    ``last(purchase_marker, ignoreNulls)`` over the preceding frame. One
    shuffle on user_id, linear work, no candidate blow-up at 100 TB."""
    ev = load_events(spark, sf_dir)
    order = [F.col("ts_ms"), F.col("event_id")]
    w = (Window.partitionBy("user_id").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts_ms"))
    purchase_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    return ev.select(
        "event_id", "user_id", "ts_ms", "event_type",
        F.last(purchase_ts, ignorenulls=True).over(w).alias("last_purchase_ts_ms"),
        F.last(purchase_id, ignorenulls=True).over(w).alias("last_purchase_id"),
    )


def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets aggregate: ROLLUP(event_type, day) with subtotal and
    grand-total rows — absent from the reference (SURVEY.md §2.2) but a
    standard OLAP surface. Spark computes all grouping sets in one pass
    (partial-agg per set); grouping_id disambiguates NULL-valued keys."""
    ev = load_events(spark, sf_dir)
    day_ms = F.expr("(ts_ms div 86400000) * 86400000")
    dec = F.col("value").cast("decimal(18,2)")
    return (
        ev.withColumn("day_ms", day_ms)
        .rollup("event_type", "day_ms")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(dec).alias("sum_dec"),
             F.grouping_id().cast("long").alias("gid"))
        .select("event_type", "day_ms", "n_events",
                roundn_col(F.col("sum_dec").cast("double")).alias("sum_value"),
                "gid")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a BOUNDED key set: per-user event counts, one column per
    event type. The explicit values list keeps the plan single-pass (no
    distinct-keys pre-query) — dynamic unbounded pivots are the wrong tool
    at scale (SURVEY.md §1.4); bounded ones are one partial-agg shuffle."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select("user_id",
                *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
                  for t in EVENT_TYPES])
    )


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles (median / p95) of value per event type — both
    engines use linear interpolation on the sorted set (Spark
    ``percentile``, DuckDB ``quantile_cont``), rounded deterministically.
    At 100 TB the exact form is a sort-based agg; swap in
    approx_percentile when a sketch is acceptable."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("p50_raw"),
             F.expr("percentile(value, 0.95)").alias("p95_raw"),
             F.count(F.lit(1)).alias("n"))
        .select("event_type",
                roundn_col(F.col("p50_raw")).alias("p50"),
                roundn_col(F.col("p95_raw")).alias("p95"),
                "n")
    )


HIST_TYPE = "purchase"   # densified histogram over one event type
HOUR_MS = 3_600_000


def q_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``date_histogram`` with empty-bucket densification: hourly
    buckets for one event type, INCLUDING the zero-count hours inside the
    matching data's [min, max] range — ES emits empty buckets; a plain
    groupBy silently drops them.

    Scale shape: the per-bucket aggregate is the usual partial-agg
    shuffle; the bucket range is a 1-row min/max aggregate exploded into
    a calendar relation (thousands of rows for years of data), and the
    gap-filling join broadcasts the aggregated (≤ calendar-sized) side —
    the corpus is never reshuffled for densification."""
    ev = (load_events(spark, sf_dir)
          .filter(F.col("event_type") == HIST_TYPE))
    bucket = F.expr(f"(ts_ms div {HOUR_MS}) * {HOUR_MS}")
    dec = F.col("value").cast("decimal(18,2)")
    per = (ev.groupBy(bucket.alias("bucket_ms"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(dec).alias("sum_dec")))
    bounds = ev.agg(
        F.min(bucket).alias("lo"), F.max(bucket).alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(HOUR_MS))).alias("bucket_ms"))
    return (
        cal.join(F.broadcast(per), "bucket_ms", "left")
        .select(
            "bucket_ms",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            roundn_col(F.coalesce(F.col("sum_dec").cast("double"), F.lit(0.0)))
            .alias("sum_value"),
            (F.col("n_events").isNull()).alias("is_empty_bucket"),
        )
    )


QUERIES = {
    "q_event_rollup": q_event_rollup,
    "q_date_histogram": q_date_histogram,
    "q_sessionize": q_sessionize,
    "q_enrich_join": q_enrich_join,
    "q_asof_join": q_asof_join,
    "q_rollup_cube": q_rollup_cube,
    "q_pivot_events": q_pivot_events,
    "q_value_quantiles": q_value_quantiles,
}

ORACLES = {
    "q_date_histogram": f"""
WITH f AS (
  SELECT (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS bucket_ms, value
  FROM events WHERE event_type = '{HIST_TYPE}'),
per AS (
  SELECT bucket_ms, count(*) AS n_events,
         sum(CAST(value AS DECIMAL(18,2))) AS sum_dec
  FROM f GROUP BY bucket_ms),
bounds AS (SELECT min(bucket_ms) AS lo, max(bucket_ms) AS hi FROM f),
cal AS (
  SELECT unnest(range(lo, hi + {HOUR_MS}, {HOUR_MS})) AS bucket_ms
  FROM bounds)
SELECT cal.bucket_ms,
       CAST(COALESCE(per.n_events, 0) AS BIGINT) AS n_events,
       {roundn_sql('COALESCE(per.sum_dec::DOUBLE, 0.0)')} AS sum_value,
       per.n_events IS NULL AS is_empty_bucket
FROM cal LEFT JOIN per USING (bucket_ms)""",

    "q_event_rollup": f"""
WITH g AS (
  SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
         count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         sum(CAST(value AS DECIMAL(18,2))) AS sum_dec
  FROM events GROUP BY 1, 2)
SELECT hour_ms, event_type, n_events, n_users,
       {roundn_sql('sum_dec::DOUBLE')} AS sum_value,
       {roundn_sql('sum_dec::DOUBLE / n_events')} AS avg_value
FROM g""",

    "q_sessionize": f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
flagged AS (
  SELECT user_id, event_id, ts_ms,
         CASE WHEN lag(ts_ms) OVER w IS NULL
                   OR ts_ms - lag(ts_ms) OVER w > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
sessions AS (
  SELECT user_id, ts_ms,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged)
SELECT user_id, session_idx,
       min(ts_ms) AS session_start_ms,
       max(ts_ms) AS session_end_ms,
       count(*) AS n_events
FROM sessions GROUP BY user_id, session_idx""",

    "q_pivot_events": f"""
SELECT user_id,
       {", ".join(f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
                  for t in EVENT_TYPES)}
FROM events GROUP BY user_id""",

    "q_value_quantiles": f"""
SELECT event_type,
       {roundn_sql('quantile_cont(value, 0.5)')} AS p50,
       {roundn_sql('quantile_cont(value, 0.95)')} AS p95,
       count(*) AS n
FROM events GROUP BY event_type""",

    "q_asof_join": """
SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type,
       last_value(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END
                  IGNORE NULLS) OVER w AS last_purchase_ts_ms,
       last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                  IGNORE NULLS) OVER w AS last_purchase_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""",

    "q_rollup_cube": f"""
WITH e AS (
  SELECT event_type, (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
         CAST(value AS DECIMAL(18,2)) AS dec_v
  FROM events)
SELECT event_type, day_ms, count(*) AS n_events,
       {roundn_sql('sum(dec_v)::DOUBLE')} AS sum_value,
       CAST(GROUPING(event_type) * 2 + GROUPING(day_ms) AS BIGINT) AS gid
FROM e GROUP BY ROLLUP(event_type, day_ms)""",

    "q_enrich_join": f"""
WITH j AS (
  SELECT n.n_name, o.o_custkey, CAST(o.o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey)
SELECT n_name, count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       {roundn_sql('sum(p)::DOUBLE')} AS revenue
FROM j GROUP BY n_name""",
}
