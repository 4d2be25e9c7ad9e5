"""ES query-DSL pack 9: the statistical pipeline aggs —
bucket_count_ks_test and bucket_correlation.

Both are ES aggregations published for change/drift detection over
bucketed data:

- ``q_bucket_ks_test``     : two-sample Kolmogorov-Smirnov D statistic
  between the ``value`` distributions of two event types. ES's
  ``bucket_count_ks_test`` runs over bucket counts, so the samples are
  first binned into {KS_BINS} fixed-width buckets over
  [{KS_LO}, {KS_HI}) (outliers clamp to the edge bins) and D is the max
  |ECDF1 - ECDF2| over the bin boundaries — the bucketed form of the
  test, which also BOUNDS the window relation (|bins| rows at any
  corpus size, where raw distinct values would be corpus-sized).
- ``q_bucket_correlation`` : Pearson correlation between two per-day
  bucket series (counts of two event types). The moments (n, Σx, Σy,
  Σxy, Σx², Σy²) accumulate as exact BIGINTs over the day relation and
  the r formula runs once in double — engine-exact by construction, no
  float summation-order exposure at all.

Scale shapes: the corpus pays ONE keyed partial-agg shuffle into the
bin/day relation for each agg; the cumulative window (KS) and the 1-row
moment aggregate (correlation) run over those bounded relations only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import (
    roundn_col,
    roundn_sql,
)
from elasticsearch_hbase_river_spark.operators.esagg import DAY_MS
from elasticsearch_hbase_river_spark.operators.esdsl8 import (
    _DAY_HIST_SQL,
    _day_hist,
)
from elasticsearch_hbase_river_spark.sources.tables import load_events

QUERIES: dict = {}
ORACLES: dict = {}

# ---------------------------------------------------------------------------
# bucket_count_ks_test — binned two-sample KS.

KS_A = "purchase"
KS_B = "click"
KS_BINS = 1000
KS_LO = 0.0
KS_HI = 100.0


def q_bucket_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bucket_count_ks_test``: two-sample KS D statistic between
    the {KS_A!r} and {KS_B!r} ``value`` distributions, computed over
    {KS_BINS} fixed-width bins (the agg's bucketed semantics; raw-value
    ECDFs would make the window relation corpus-sized). One row:
    sample sizes and the 6-dp D statistic.

    Scale shape: one conditional partial-agg shuffle onto |bins| keys;
    the cumulative ECDF window and the final max run over the bounded
    bin relation. The window is single-partition BY DESIGN — ≤{KS_BINS}
    rows at any corpus size."""
    ev = (load_events(spark, sf_dir)
          .filter(F.col("event_type").isin(KS_A, KS_B)))
    width = (KS_HI - KS_LO) / KS_BINS
    rawbin = F.floor((F.col("value") - KS_LO) / width).cast("long")
    binned = ev.select(
        F.least(F.greatest(rawbin, F.lit(0)),
                F.lit(KS_BINS - 1)).alias("bin"),
        "event_type")
    per_bin = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("event_type") == KS_A, 1).otherwise(0))
        .cast("long").alias("na"),
        F.sum(F.when(F.col("event_type") == KS_B, 1).otherwise(0))
        .cast("long").alias("nb"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_bin.select(
        "bin",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"))
    totals = per_bin.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    diff = F.abs(F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb"))
    return (cum.crossJoin(F.broadcast(totals))
            .agg(F.max("ta").cast("long").alias("n_a"),
                 F.max("tb").cast("long").alias("n_b"),
                 roundn_col(F.max(diff)).alias("d_stat")))


ORACLES["q_bucket_ks_test"] = f"""
WITH ev AS (
  SELECT least(greatest(CAST(floor((value - {KS_LO})
           / {(KS_HI - KS_LO) / KS_BINS}) AS BIGINT), 0),
         {KS_BINS - 1}) AS bin,
         event_type
  FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')),
per_bin AS (
  SELECT bin,
         CAST(count(*) FILTER (event_type = '{KS_A}') AS BIGINT) AS na,
         CAST(count(*) FILTER (event_type = '{KS_B}') AS BIGINT) AS nb
  FROM ev GROUP BY bin),
cum AS (
  SELECT bin,
         sum(na) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         sum(nb) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
  FROM per_bin),
totals AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM per_bin)
SELECT CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b,
       {roundn_sql('max(abs(ca / ta::DOUBLE - cb / tb::DOUBLE))')}
       AS d_stat
FROM cum, totals"""

# ---------------------------------------------------------------------------
# bucket_correlation — Pearson r between two per-day bucket series.

CORR_X = "purchase"
CORR_Y = "click"


def q_bucket_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bucket_correlation`` (Pearson): correlation between the
    per-day {CORR_X!r} and {CORR_Y!r} counts. The day series' moments
    accumulate EXACTLY in wide integers — DECIMAL(38,0) here, HUGEINT in
    the oracle (a plain BIGINT sum of x·y wraps once day counts pass
    ~3e9: 100 TB territory) — then each full formula term converts to
    double ONCE, identically in both engines: no float accumulation
    order anywhere.

    Scale shape: one keyed partial-agg shuffle into days; the moment
    aggregate is 1-row over the calendar-sized day relation."""
    ev = (load_events(spark, sf_dir)
          .filter(F.col("event_type").isin(CORR_X, CORR_Y)))
    day = ev.groupBy(F.expr(f"ts_ms div {DAY_MS}").alias("day_id")).agg(
        F.sum(F.when(F.col("event_type") == CORR_X, 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == CORR_Y, 1).otherwise(0))
        .cast("long").alias("y"))
    dx = F.col("x").cast("decimal(19,0)")
    dy = F.col("y").cast("decimal(19,0)")
    m = day.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dx).cast("decimal(38,0)").alias("sx"),
        F.sum(dy).cast("decimal(38,0)").alias("sy"),
        F.sum(dx * dy).cast("decimal(38,0)").alias("sxy"),
        F.sum(dx * dx).cast("decimal(38,0)").alias("sxx"),
        F.sum(dy * dy).cast("decimal(38,0)").alias("syy"))
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((n * F.col("sxx")
                   - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((n * F.col("syy")
                   - F.col("sy") * F.col("sy")).cast("double"))
    return m.select(
        "n", roundn_col(num / (denx * deny)).alias("pearson_r"))


ORACLES["q_bucket_correlation"] = f"""
WITH day AS (
  SELECT epoch_ms(ts) // {DAY_MS} AS day_id,
         CAST(count(*) FILTER (event_type = '{CORR_X}') AS BIGINT) AS x,
         CAST(count(*) FILTER (event_type = '{CORR_Y}') AS BIGINT) AS y
  FROM events WHERE event_type IN ('{CORR_X}', '{CORR_Y}')
  GROUP BY 1),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM day)
SELECT n,
       {roundn_sql('''CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))''')}
       AS pearson_r
FROM m"""

# ---------------------------------------------------------------------------
# moving_fn: the published ewma model (MovingFunctions.ewma).

EWMA_ALPHA = 0.3
EWMA_WINDOW = 7


def _ewma_weight_cases() -> tuple[str, str]:
    """ES's ``MovingFunctions.ewma`` recurses over the window's PRESENT
    buckets seeded with the oldest: unrolled, the bucket at position
    ``p`` from the newest gets ``a·(1-a)^p``, except the oldest present
    bucket which gets ``(1-a)^p`` — position-keyed (not calendar-
    distance-keyed) so the weights telescope to exactly 1 even when the
    sparse day relation has gaps inside the window, matching the
    published recursion over whatever buckets exist. The powers are
    precomputed DRIVER-SIDE into literal strings so both engines consume
    identical constants — ``pow()`` is libm-dependent and must not run
    inside either engine. Returns (seed_case, tail_case) keyed on the
    window position ``p``."""
    seed, tail = [], []
    for p in range(EWMA_WINDOW):
        w = (1.0 - EWMA_ALPHA) ** p
        # CAST: a bare float literal parses as limited-scale DECIMAL in
        # BOTH dialects (the esdsl3 geo note) — force double
        seed.append(f"WHEN {p} THEN CAST({w!r} AS DOUBLE)")
        tail.append(f"WHEN {p} THEN CAST({EWMA_ALPHA * w!r} AS DOUBLE)")
    return (f"CASE p {' '.join(seed)} END",
            f"CASE p {' '.join(tail)} END")


def q_moving_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``moving_fn`` with the published ``MovingFunctions.ewma``
    model (alpha={EWMA_ALPHA}, calendar window {EWMA_WINDOW} days) over
    the per-day purchase histogram. The window recursion is UNROLLED
    into literal weights keyed on each present bucket's POSITION from
    the newest (seed = the oldest present bucket), so weights telescope
    to exactly 1 under gaps and the value is a closed-form weighted sum
    both engines compute from identical driver-side constants.

    Scale shape: a bounded range self-join of the DAY relation with
    itself (distance ≤ {EWMA_WINDOW}-1 — calendar-sized on both sides;
    the corpus pays one keyed partial-agg shuffle below it), a per-day
    position window, then one keyed aggregate. The broadcast
    nested-loop join is over thousands of rows at any corpus size."""
    buckets = _day_hist(spark, sf_dir)
    t = buckets.select(F.col("day_id").alias("t_day"), "n")
    s = buckets.select(F.col("day_id").alias("s_day"),
                       F.col("n").alias("s_n"))
    pairs = t.join(F.broadcast(s),
                   (F.col("t_day") - F.col("s_day") >= 0)
                   & (F.col("t_day") - F.col("s_day") < EWMA_WINDOW))
    w = Window.partitionBy("t_day").orderBy(F.col("s_day").desc())
    seed_case, tail_case = _ewma_weight_cases()
    pairs = (pairs
             .withColumn("p", (F.row_number().over(w) - 1).cast("int"))
             .withColumn("np", F.count(F.lit(1))
                         .over(Window.partitionBy("t_day"))))
    weight = F.when(F.col("p") == F.col("np") - 1, F.expr(seed_case)) \
              .otherwise(F.expr(tail_case))
    return (pairs.withColumn("wgt", weight)
            .groupBy(F.col("t_day").alias("day_id"))
            .agg(F.max(F.when(F.col("p") == 0, F.col("s_n")))
                 .alias("n"),
                 roundn_col(F.sum(F.col("wgt") * F.col("s_n")))
                 .alias("ewma"))
            .orderBy("day_id"))


def _ewma_oracle() -> str:
    seed_case, tail_case = _ewma_weight_cases()
    return f"""
WITH b AS ({_DAY_HIST_SQL}),
pairs AS (
  SELECT t.day_id AS t_day, s.day_id AS s_day, s.n AS s_n
  FROM b t JOIN b s ON t.day_id - s.day_id >= 0
                   AND t.day_id - s.day_id < {EWMA_WINDOW}),
pos AS (
  SELECT t_day, s_n,
         CAST(row_number() OVER (PARTITION BY t_day
                                 ORDER BY s_day DESC) - 1
              AS INTEGER) AS p,
         count(*) OVER (PARTITION BY t_day) AS np
  FROM pairs),
weighted AS (
  SELECT t_day, p, s_n,
         CASE WHEN p = np - 1
              THEN {seed_case} ELSE {tail_case} END AS wgt
  FROM pos)
SELECT t_day AS day_id,
       max(CASE WHEN p = 0 THEN s_n END) AS n,
       {roundn_sql('sum(wgt * s_n)')} AS ewma
FROM weighted GROUP BY t_day ORDER BY day_id"""


ORACLES["q_moving_ewma"] = _ewma_oracle()

# ---------------------------------------------------------------------------
# search_template — mustache-param rendering into an executable query.

#: The stored template: a term match + numeric range over events, with
#: three mustache params. ES renders server-side, then executes the
#: rendered body — rendering here is pure driver-side string work.
SEARCH_TEMPLATE = ("type={{event_type}} value_gte={{min_value}} "
                   "top={{size}}")
TEMPLATE_PARAMS = {"event_type": "purchase", "min_value": "50",
                   "size": "15"}


def render_template(template: str, params: dict[str, str]) -> dict[str, str]:
    """Render a mustache-subset template (``{{name}}`` placeholders
    only) into the query's key=value clauses. Unknown placeholders and
    unused params both raise — ES's strict-params behavior."""
    import re

    used = set()

    def sub(m) -> str:
        k = m.group(1)
        if k not in params:
            raise ValueError(f"missing template param: {k!r}")
        used.add(k)
        return params[k]

    body = re.sub(r"\{\{([a-z_]+)\}\}", sub, template)
    unused = set(params) - used
    if unused:
        raise ValueError(f"unused template params: {sorted(unused)}")
    if "{{" in body or "}}" in body:
        raise ValueError("unrendered placeholder left in template body")
    return dict(kv.split("=", 1) for kv in body.split())


def q_search_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search-template execution: render {SEARCH_TEMPLATE!r} with
    the stored params, then run the rendered query — a term filter on
    event_type + a gte range on value, top-N by value. The render is
    driver-side microseconds; the executed plan is the plain pushable
    term+range scan with a TakeOrdered top-k."""
    q = render_template(SEARCH_TEMPLATE, TEMPLATE_PARAMS)
    ev = load_events(spark, sf_dir)
    return (ev.filter((F.col("event_type") == q["type"])
                      & (F.col("value") >= float(q["value_gte"])))
            .select("event_id", "user_id",
                    roundn_col(F.col("value")).alias("value"))
            .orderBy(F.col("value").desc(), "event_id")
            .limit(int(q["top"])))


def _search_template_oracle() -> str:
    q = render_template(SEARCH_TEMPLATE, TEMPLATE_PARAMS)
    return f"""
SELECT event_id, user_id, {roundn_sql('value')} AS value
FROM events
WHERE event_type = '{q["type"]}' AND value >= {float(q["value_gte"])}
ORDER BY value DESC, event_id LIMIT {int(q["top"])}"""


ORACLES["q_search_template"] = _search_template_oracle()

# ---------------------------------------------------------------------------

QUERIES.update({
    "q_bucket_ks_test": q_bucket_ks_test,
    "q_bucket_correlation": q_bucket_correlation,
    "q_moving_ewma": q_moving_ewma,
    "q_search_template": q_search_template,
})
