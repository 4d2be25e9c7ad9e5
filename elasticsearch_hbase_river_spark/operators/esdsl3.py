"""ES query-DSL pack 3: statistical, set-semantic, sampling, and geo
shapes.

The reference serves river documents to the full ES query DSL
(`HBaseRiver.java:1-35`); packs 1–2 (`esagg.py`, `esdsl2.py`) cover
scoring, joins, and the bucket/pipeline aggregations. This module closes
the remaining everyday families:

- ``q_matrix_stats``        : ES ``matrix_stats`` aggregation — the
  pairwise covariance/correlation matrix over numeric fields, computed
  from ONE pass of exact decimal moment sums.
- ``q_terms_set``           : ES ``terms_set`` query with
  ``minimum_should_match_field`` — a document matches when it contains at
  least its OWN per-document threshold of the query's terms.
- ``q_diversified_sampler`` : ES ``diversified_sampler`` aggregation —
  a deterministic hash-ranked sample capped per diversity value, with a
  sub-aggregation computed over the sample only.
- ``q_geo_distance``        : ES ``geo_distance`` query + ``geo_distance``
  (ring) aggregation — haversine distance from an origin, filtered to a
  radius, bucketed into distance rings.
- ``q_geotile_grid``        : ES ``geotile_grid`` aggregation — web-
  mercator z/x/y tile buckets (the slippy-map twin of geohash_grid whose
  cell math is portable integer/IEEE arithmetic in any engine).

The fixture tables carry no coordinates, so the geo queries derive a
stable per-user location from the md5 of the user id (16-bit lat / 16-bit
lon grid): the POINT SYNTHESIS is fixture plumbing, but the distance /
tile operators themselves are the real ES semantics and run unchanged on
a table that ships true coordinates.

Scale shapes:
- matrix_stats: one partial-aggregated corpus scan down to a single row
  of decimal moment sums; the pair matrix expands from that row map-side.
- terms_set: the fixed term set is matched IN-ROW (array_intersect over
  one analyzer pass) — zero shuffles, zero joins at any corpus size; the
  per-doc threshold is map-side column math.
- diversified_sampler: the per-value cap is a hash-ordered row_number
  inside the diversity key's own shuffle partition; the global sample is
  a bounded top-N (TakeOrdered — never a corpus-wide single partition),
  and the sub-agg runs on ≤ N rows.
- geo: location derivation and haversine/tile math are map-side codegen;
  each query is exactly one shuffle (the ring/tile/count agg). The
  distance filter sits below the aggregation, so at 100 TB the ring agg
  sees only in-radius users.

All float outputs go through the portable ``floor(x*1e4+0.5)/1e4``
rounding (`functions/determinism.py`); sums that feed them are exact
DECIMAL accumulations, so both engines derive identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import (
    roundn_col,
    roundn_sql,
)
from elasticsearch_hbase_river_spark.functions.analyzer import analyze_tokens
from elasticsearch_hbase_river_spark.operators.search import (
    _POSTINGS_SQL,
    _postings,
)
from elasticsearch_hbase_river_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# ---------------------------------------------------------------------------
# matrix_stats — pairwise covariance / correlation over numeric fields.
#
# ES computes count / mean / variance per field plus covariance and
# correlation per field pair. Built-in corr()/covar_samp() differ between
# engines in summation order and bias handling, so both sides compute the
# matrix from EXACT decimal moment sums (the fixture's measures are 2-dp
# values, so DECIMAL(12,2) casts are lossless) and derive the population
# statistics with the identical double formula.

MS_FIELDS = ("quantity", "discount", "tax")
_MS_COLS = {"quantity": "l_quantity", "discount": "l_discount",
            "tax": "l_tax"}


def q_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT fanned: a dedicated-session A/B measured the scan fanout a wash
    # (exec [2.88, 0.96, 1.33, 0.84] vs [2.61, 1.17, 0.84, 0.85] at
    # sf0.1/32) — the lineitem scan+decode dominates, not the decimal
    # agg CPU, so the extra exchange buys nothing (r12).
    li = load_table(spark, sf_dir, "lineitem")
    d = {f: F.col(c).cast("decimal(12,2)") for f, c in _MS_COLS.items()}
    aggs = [F.count(F.lit(1)).alias("n")]
    for f in MS_FIELDS:
        aggs.append(F.sum(d[f]).alias(f"s_{f}"))
        aggs.append(F.sum(d[f] * d[f]).alias(f"s_{f}_{f}"))
    for i, fx in enumerate(MS_FIELDS):
        for fy in MS_FIELDS[i + 1:]:
            aggs.append(F.sum(d[fx] * d[fy]).alias(f"s_{fx}_{fy}"))
    m = li.agg(*aggs)

    def dbl(name: str) -> F.Column:
        return F.col(name).cast("double")

    n = dbl("n")
    rows = []
    for i, fx in enumerate(MS_FIELDS):
        for fy in MS_FIELDS[i + 1:]:
            mean_x = dbl(f"s_{fx}") / n
            mean_y = dbl(f"s_{fy}") / n
            var_x = (dbl(f"s_{fx}_{fx}") - dbl(f"s_{fx}") * dbl(f"s_{fx}") / n) / n
            var_y = (dbl(f"s_{fy}_{fy}") - dbl(f"s_{fy}") * dbl(f"s_{fy}") / n) / n
            cov = (dbl(f"s_{fx}_{fy}") - dbl(f"s_{fx}") * dbl(f"s_{fy}") / n) / n
            rows.append(F.struct(
                F.lit(fx).alias("field_x"), F.lit(fy).alias("field_y"),
                F.col("n").cast("long").alias("n_rows"),
                roundn_col(mean_x).alias("mean_x"),
                roundn_col(mean_y).alias("mean_y"),
                roundn_col(var_x).alias("var_x"),
                roundn_col(var_y).alias("var_y"),
                roundn_col(cov).alias("covariance"),
                roundn_col(cov / F.sqrt(var_x * var_y)).alias("correlation"),
            ))
    return (m.select(F.explode(F.array(*rows)).alias("p")).select("p.*"))


QUERIES["q_matrix_stats"] = q_matrix_stats


def _ms_oracle() -> str:
    sums = ["count(*) AS n"]
    for f in MS_FIELDS:
        c = _MS_COLS[f]
        sums.append(f"sum(CAST({c} AS DECIMAL(12,2))) AS s_{f}")
        sums.append(f"sum(CAST({c} AS DECIMAL(12,2)) * CAST({c} AS DECIMAL(12,2))) AS s_{f}_{f}")
    pairs = [(fx, fy) for i, fx in enumerate(MS_FIELDS)
             for fy in MS_FIELDS[i + 1:]]
    for fx, fy in pairs:
        cx, cy = _MS_COLS[fx], _MS_COLS[fy]
        sums.append(f"sum(CAST({cx} AS DECIMAL(12,2)) * CAST({cy} AS DECIMAL(12,2))) AS s_{fx}_{fy}")
    sel = []
    for fx, fy in pairs:
        mean_x = f"(CAST(s_{fx} AS DOUBLE) / n)"
        mean_y = f"(CAST(s_{fy} AS DOUBLE) / n)"
        var_x = (f"((CAST(s_{fx}_{fx} AS DOUBLE) - CAST(s_{fx} AS DOUBLE)"
                 f" * CAST(s_{fx} AS DOUBLE) / n) / n)")
        var_y = (f"((CAST(s_{fy}_{fy} AS DOUBLE) - CAST(s_{fy} AS DOUBLE)"
                 f" * CAST(s_{fy} AS DOUBLE) / n) / n)")
        cov = (f"((CAST(s_{fx}_{fy} AS DOUBLE) - CAST(s_{fx} AS DOUBLE)"
               f" * CAST(s_{fy} AS DOUBLE) / n) / n)")
        sel.append(
            f"SELECT '{fx}' AS field_x, '{fy}' AS field_y,"
            f" CAST(n AS BIGINT) AS n_rows,"
            f" {roundn_sql(mean_x)} AS mean_x,"
            f" {roundn_sql(mean_y)} AS mean_y,"
            f" {roundn_sql(var_x)} AS var_x,"
            f" {roundn_sql(var_y)} AS var_y,"
            f" {roundn_sql(cov)} AS covariance,"
            f" {roundn_sql(f'{cov} / sqrt({var_x} * {var_y})')} AS correlation"
            f" FROM m")
    return ("WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
            + "\nUNION ALL\n".join(sel))


ORACLES["q_matrix_stats"] = _ms_oracle()

# ---------------------------------------------------------------------------
# terms_set — match docs containing >= a PER-DOCUMENT threshold of the
# query's terms (ES minimum_should_match_field: longer docs must match
# more of the set).

TS_TERMS = ("vector", "stream", "window", "merge")


def _ts_msm_col() -> F.Column:
    return F.least(F.lit(len(TS_TERMS)),
                   F.lit(2) + F.floor(F.col("n_chars") / F.lit(600))
                   .cast("int")).cast("long")


def q_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The term set is a FIXED handful, so the match is an in-row
    # array_intersect over one analyzer pass (r12, guide §2.4 — same
    # fixed-term argument as the BM25 single-pass scorers): no postings
    # explode, no corpus-wide (doc_id, token) distinct shuffle, no join.
    # array_intersect returns the distinct matched terms, exactly what
    # the old distinct + collect_list pair produced; docs with zero
    # matches fall to the msm filter (msm >= 2), matching the old inner
    # join's drop of match-less docs.
    docs = load_table(spark, sf_dir, "documents")
    matched = F.array_sort(F.array_intersect(
        analyze_tokens(F.col("text")),
        F.array(*[F.lit(t) for t in TS_TERMS])))
    return (docs.select("doc_id", _ts_msm_col().alias("msm"),
                        matched.alias("ma"))
            .withColumn("n_matched", F.size("ma").cast("long"))
            .filter(F.col("n_matched") >= F.col("msm"))
            .select("doc_id", "msm", "n_matched",
                    F.array_join("ma", ",").alias("matched_terms")))


QUERIES["q_terms_set"] = q_terms_set

_TS_LIST = ", ".join(f"'{t}'" for t in TS_TERMS)

ORACLES["q_terms_set"] = f"""
WITH tok AS ({_POSTINGS_SQL}),
doc_tok AS (SELECT DISTINCT doc_id, token FROM tok
            WHERE token IN ({_TS_LIST})),
matched AS (
  SELECT doc_id, count(*) AS n_matched,
         array_to_string(list_sort(list(token)), ',') AS matched_terms
  FROM doc_tok GROUP BY doc_id),
msm AS (
  SELECT doc_id,
         least({len(TS_TERMS)}, 2 + CAST(floor(n_chars / 600.0) AS INT))
           AS msm
  FROM documents)
SELECT d.doc_id, CAST(m.msm AS BIGINT) AS msm,
       CAST(d.n_matched AS BIGINT) AS n_matched, d.matched_terms
FROM matched d JOIN msm m USING (doc_id)
WHERE d.n_matched >= m.msm"""

# ---------------------------------------------------------------------------
# diversified_sampler — hash-ranked sample, capped per diversity value,
# sub-agg over the sample only. ES uses it to de-bias an aggregation
# dominated by one source/author; determinism here comes from ranking on
# md5(doc_id) (content hash, stable under any partitioning) instead of
# ES's shard-local first-come order.

DS_MAX_PER_SOURCE = 5     # max_docs_per_value on the diversity field
DS_SAMPLE = 50            # sampler shard_size (global here: one "shard")


def q_diversified_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    capped = (docs.withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= DS_MAX_PER_SOURCE))
    sample = capped.orderBy("h", "doc_id").limit(DS_SAMPLE)
    return (sample.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_sampled"),
                 roundn_col(F.sum("n_chars").cast("double")
                            / F.count(F.lit(1)), 4).alias("avg_chars")))


QUERIES["q_diversified_sampler"] = q_diversified_sampler

ORACLES["q_diversified_sampler"] = f"""
WITH ranked AS (
  SELECT doc_id, lang, source, n_chars,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS r
  FROM documents),
sample AS (
  SELECT * FROM ranked WHERE r <= {DS_MAX_PER_SOURCE}
  ORDER BY h, doc_id LIMIT {DS_SAMPLE})
SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
       {roundn_sql('CAST(sum(n_chars) AS DOUBLE) / count(*)', 4)}
         AS avg_chars
FROM sample GROUP BY lang"""

# ---------------------------------------------------------------------------
# geo: stable per-user synthetic location. 16 bits of md5 per axis via
# portable hex-digit arithmetic; /65536 is a power-of-two division, so
# every derived coordinate is the identical double in both engines.
# Latitude spans [-80, 80) to stay inside the web-mercator domain.

GEO_ORIGIN_LAT = 37.0
GEO_ORIGIN_LON = -122.0
GEO_RADIUS_KM = 4000.0
GEO_RING_KM = 1000.0
GEO_ZOOM_N = 16           # 2^zoom tiles per axis (zoom = 4)
EARTH_R_KM = 6371.0088
_PI = 3.141592653589793

_HEX = "0123456789abcdef"


def _h16_sql(tag: str, instr: str, strtype: str = "STRING") -> str:
    """Portable 16-bit integer from md5('<tag>|' || user_id)."""
    h = f"md5(CONCAT('{tag}|', CAST(user_id AS {strtype})))"
    parts = [f"(({instr}('{_HEX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)})"
             for i in range(4)]
    return "(" + " + ".join(parts) + ")"


# NOTE the e0 exponent literals: Spark SQL parses a bare `65536.0` as a
# DECIMAL literal, so `int / 65536.0` runs limited-scale DECIMAL division
# while DuckDB runs double division — the derived coordinates differed by
# ~1e-5 degrees (caught by the 4-dp centroid oracle). `65536e0` is a
# DOUBLE literal in both dialects, and h/2^16 is then IEEE-exact.


def _geo_users_sql(instr: str) -> str:
    lat16 = _h16_sql("lat", instr, "VARCHAR")
    lon16 = _h16_sql("lon", instr, "VARCHAR")
    return (f"SELECT DISTINCT user_id,"
            f" (-80e0 + 160e0 * ({lat16} / 65536e0)) AS lat,"
            f" (-180e0 + 360e0 * ({lon16} / 65536e0)) AS lon"
            f" FROM events")


def _geo_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users with their synthetic point.

    Plan note (r12, generalizing the fix q_geo_polygon carried locally):
    deriving lat/lon as a plain projection ABOVE the ``distinct`` lets
    Catalyst substitute the md5-heavy coordinate expressions into any
    downstream filter and push it BELOW the dedup, evaluating it once
    per EVENT instead of once per USER (q_geo_distance's ring filter
    ran 60x too often at sf0.1; q_geo_polygon measured 12.6 s at sf1).
    Computing the two 16-bit hash halves as ``min()`` AGGREGATE outputs
    of a second aggregate over the deduped users pins every consumer's
    predicate above the dedup (filters on aggregate results are not
    pushable) while the hash is still evaluated once per user; the
    second groupBy reuses the distinct's partitioning, so it adds no
    Exchange. min() over the single row per user is that row's value —
    results are bit-identical for every consumer."""
    ev = load_table(spark, sf_dir, "events")
    lat16, lon16 = _h16_sql("lat", "instr"), _h16_sql("lon", "instr")
    return (ev.select("user_id").distinct()
            .groupBy("user_id")
            .agg(F.min(F.expr(lat16)).alias("h_lat"),
                 F.min(F.expr(lon16)).alias("h_lon"))
            .select("user_id",
                    F.expr("-80e0 + 160e0 * (h_lat / 65536e0)").alias("lat"),
                    F.expr("-180e0 + 360e0 * (h_lon / 65536e0)").alias("lon")))


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Identical formula text in both engines — radians/sin/cos/asin are
    the only libm calls, and the outputs are rounded before hashing."""
    return (
        f"(2.0 * {EARTH_R_KM} * asin(sqrt("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2.0), 2.0)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin((radians({lon2}) - radians({lon1})) / 2.0), 2.0))))")


def q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = _geo_users(spark, sf_dir)
    dist = _haversine_sql(str(GEO_ORIGIN_LAT), str(GEO_ORIGIN_LON),
                          "lat", "lon")
    ringed = (users.select(F.expr(dist).alias("dist"))
              .filter(F.col("dist") < GEO_RADIUS_KM)
              .select(F.floor(F.col("dist") / F.lit(GEO_RING_KM))
                      .cast("bigint").alias("ring"),
                      F.expr(roundn_sql("dist", 4))
                      .cast("decimal(18,4)").alias("dist_r")))
    # Final average rounds at 2 dp: the engines' libm (sin/cos/asin)
    # disagree by ~1e-4 km per row, so a few per-row 4-dp quantizations
    # flip either way and the exact decimal sums drift by ~sqrt(n)*1e-4;
    # a 0.01 km output granularity keeps the mismatch probability
    # negligible at every fixture scale (and shrinks as n grows).
    return (ringed.groupBy("ring")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 roundn_col(F.sum("dist_r").cast("double")
                            / F.count(F.lit(1)), 2).alias("avg_km")))


QUERIES["q_geo_distance"] = q_geo_distance


def _geo_distance_oracle() -> str:
    dist = _haversine_sql(str(GEO_ORIGIN_LAT), str(GEO_ORIGIN_LON),
                          "lat", "lon")
    return f"""
WITH geo_users AS ({_geo_users_sql("strpos")})
SELECT ring, CAST(count(*) AS BIGINT) AS n_users,
       {roundn_sql("CAST(sum(dist_r) AS DOUBLE) / count(*)", 2)}
         AS avg_km
FROM (SELECT CAST(floor(dist / {GEO_RING_KM}) AS BIGINT) AS ring,
             CAST({roundn_sql('dist', 4)} AS DECIMAL(18,4)) AS dist_r
      FROM (SELECT {dist} AS dist FROM geo_users)
      WHERE dist < {GEO_RADIUS_KM})
GROUP BY ring"""


ORACLES["q_geo_distance"] = _geo_distance_oracle()


def _tile_sql() -> tuple[str, str]:
    tx = f"CAST(floor((lon + 180.0) / 360.0 * {GEO_ZOOM_N}) AS BIGINT)"
    merc = f"ln(tan(radians(lat)) + 1.0 / cos(radians(lat)))"
    ty = (f"CAST(floor((1.0 - {merc} / {_PI}) / 2.0 * {GEO_ZOOM_N})"
          f" AS BIGINT)")
    return tx, ty


def q_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = _geo_users(spark, sf_dir)
    tx, ty = _tile_sql()
    return (users.select(F.expr(tx).alias("tile_x"),
                         F.expr(ty).alias("tile_y"))
            .groupBy("tile_x", "tile_y")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


QUERIES["q_geotile_grid"] = q_geotile_grid


def _geotile_oracle() -> str:
    tx, ty = _tile_sql()
    return f"""
WITH geo_users AS ({_geo_users_sql("strpos")})
SELECT {tx} AS tile_x, {ty} AS tile_y,
       CAST(count(*) AS BIGINT) AS n_users
FROM geo_users GROUP BY 1, 2"""


ORACLES["q_geotile_grid"] = _geotile_oracle()

# ---------------------------------------------------------------------------
# rank_eval — ES's search-quality evaluation API: a batch of queries runs
# against the engine, each ranked list is joined with graded relevance
# judgments, and precision@k / reciprocal rank / NDCG@k come back per
# query. Judgments here derive from a stable content hash (md5 of
# query|doc), so both engines evaluate the identical labeled set; on a
# real deployment they are a (query, doc_id, rating) table and the hash
# column swaps for a join.
#
# Scale shape: each query's candidate set is the postings of its term
# (bounded by df, never the corpus); ranking/metrics are windows
# partitioned BY QUERY over those candidates, so the work per query is
# df-proportional and queries evaluate in parallel. The final relation is
# |queries| rows.

RE_QUERIES = ("vector", "stream", "window", "merge", "filter", "sort")
RE_K = 10          # evaluate the top-10 of each ranked list
RE_RELEVANT = 2    # rating >= 2 counts as relevant (gradings are 0..3)
_LN2 = 0.6931471805599453   # math.log(2.0) — same IEEE literal both engines


def _zero_safe_ratio(num: F.Column, den: F.Column) -> F.Column:
    """0.0 when the denominator is 0 (an all-zero-rating list): Spark's
    0/0 is NULL while DuckDB's is NaN, so both sides guard explicitly."""
    return F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)


def _rating_sql(instr: str, strtype: str) -> str:
    """Portable 0..3 grade from md5(token|doc_id) (hex-digit arithmetic,
    same idiom as the curation split buckets)."""
    h = f"md5(CONCAT(token, '|', CAST(doc_id AS {strtype})))"
    b = (f"(({instr}('{_HEX}', substr({h}, 1, 1)) - 1) * 16"
         f" + ({instr}('{_HEX}', substr({h}, 2, 1)) - 1))")
    return f"({b} % 4)"


def rank_eval_metrics(scored: DataFrame) -> DataFrame:
    """precision@k / reciprocal rank / NDCG@k per query over a
    ``(doc_id, token, score)`` relation — shared by the rebuild path
    (:func:`q_rank_eval`) and the index-served twin
    (`indexed_search.q_rank_eval_indexed`)."""
    w = Window.partitionBy("token").orderBy(F.col("score").desc(), "doc_id")
    hits = (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= RE_K)
            .withColumn("rating",
                        F.expr(_rating_sql("instr", "STRING"))))
    wi = Window.partitionBy("token").orderBy(F.col("rating").desc(),
                                             "doc_id")
    gain = (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
    per_q = (hits.withColumn("irank", F.row_number().over(wi))
             .groupBy("token")
             .agg(F.count(F.lit(1)).cast("long").alias("n_retrieved"),
                  roundn_col(F.sum((F.col("rating") >= RE_RELEVANT)
                                   .cast("double"))
                             / F.count(F.lit(1))).alias("precision_at_k"),
                  roundn_col(F.coalesce(
                      F.max(F.when(F.col("rating") >= RE_RELEVANT,
                                   1.0 / F.col("rank"))),
                      F.lit(0.0))).alias("reciprocal_rank"),
                  roundn_col(_zero_safe_ratio(
                      F.sum(gain / (F.log(F.col("rank") + 1.0)
                                    / F.lit(_LN2))),
                      F.sum(gain / (F.log(F.col("irank") + 1.0)
                                    / F.lit(_LN2)))
                  )).alias("ndcg_at_k")))
    return per_q.withColumnRenamed("token", "query_term")


def q_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elasticsearch_hbase_river_spark.operators.search import (
        BM25_B,
        BM25_K1,
        _dl_col,
    )
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg(_dl_col()).alias("avgdl"))
    dl = docs.select("doc_id", _dl_col().alias("dl"))
    tf = (_postings(docs)
          .filter(F.col("token").isin(*RE_QUERIES))
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfr = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(F.broadcast(dfr), "token")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .withColumn("score",
                          F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5)
                                / (F.col("df") + 0.5))
                          * (F.col("tf") * (BM25_K1 + 1))
                          / (F.col("tf") + BM25_K1
                             * (1 - BM25_B
                                + BM25_B * F.col("dl") / F.col("avgdl")))))
    return rank_eval_metrics(scored.select("doc_id", "token", "score"))


QUERIES["q_rank_eval"] = q_rank_eval

_RE_LIST = ", ".join(f"'{t}'" for t in RE_QUERIES)


def _rank_eval_oracle() -> str:
    from elasticsearch_hbase_river_spark.operators.search import (
        BM25_B,
        BM25_K1,
        _DL_SQL,
    )
    rating = _rating_sql("strpos", "VARCHAR")
    return f"""
WITH tok AS ({_POSTINGS_SQL}),
dl AS (SELECT doc_id, CAST({_DL_SQL} AS BIGINT) AS dl FROM documents),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 avg({_DL_SQL}) AS avgdl FROM documents),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ({_RE_LIST}) GROUP BY doc_id, token),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token,
         ln(1.0 + (stats.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
         * (tf.tf * ({BM25_K1} + 1)) /
           (tf.tf + {BM25_K1}
            * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl)) AS score
  FROM tf JOIN dfr USING (token) JOIN dl USING (doc_id)
  CROSS JOIN stats),
hits AS (
  SELECT token, doc_id, rank, {rating} AS rating
  FROM (SELECT token, doc_id, score,
               row_number() OVER (PARTITION BY token
                                  ORDER BY score DESC, doc_id) AS rank
        FROM scored)
  WHERE rank <= {RE_K}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY token
                               ORDER BY rating DESC, doc_id) AS irank
  FROM hits)
SELECT token AS query_term,
       CAST(count(*) AS BIGINT) AS n_retrieved,
       {roundn_sql(f"sum(CASE WHEN rating >= {RE_RELEVANT} THEN 1.0 ELSE 0.0 END) / count(*)")}
         AS precision_at_k,
       {roundn_sql(f"coalesce(max(CASE WHEN rating >= {RE_RELEVANT} THEN 1.0 / rank END), 0.0)")}
         AS reciprocal_rank,
       {roundn_sql(
           f"CASE WHEN sum((pow(2.0, rating) - 1.0) / (ln(irank + 1.0) / {_LN2!r})) = 0.0"
           f" THEN 0.0"
           f" ELSE sum((pow(2.0, rating) - 1.0) / (ln(rank + 1.0) / {_LN2!r}))"
           f" / sum((pow(2.0, rating) - 1.0) / (ln(irank + 1.0) / {_LN2!r})) END")}
         AS ndcg_at_k
FROM ranked GROUP BY token"""


ORACLES["q_rank_eval"] = _rank_eval_oracle()

# ---------------------------------------------------------------------------
# Remaining ES metric aggregations: boxplot, median_absolute_deviation,
# weighted_avg, t_test. All are single-pass (or two-pass for MAD, whose
# second pass joins a broadcast k-row median table) partial-aggregated
# shuffles keyed on the bucket field; the t statistic derives from exact
# decimal moment sums with the identical double formula in both engines
# (ES computes these with TDigest sketches server-side; the exact form
# here is the sort-based/ moment-sum analog, the same trade documented on
# q_value_quantiles).

WA_MOD = 10          # weighted_avg weight = (user_id % WA_MOD) + 1
TT_TYPE_A = "purchase"
TT_TYPE_B = "click"


def q_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``boxplot`` aggregation per event type: min / q1 / median / q3 /
    max over ``value`` (exact linear-interpolated quantiles)."""
    from elasticsearch_hbase_river_spark.sources.tables import load_events
    ev = load_events(spark, sf_dir)
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 roundn_col(F.min("value")).alias("min_v"),
                 roundn_col(F.expr("percentile(value, 0.25)")).alias("q1"),
                 roundn_col(F.expr("percentile(value, 0.5)")).alias("median_v"),
                 roundn_col(F.expr("percentile(value, 0.75)")).alias("q3"),
                 roundn_col(F.max("value")).alias("max_v")))


QUERIES["q_boxplot"] = q_boxplot

ORACLES["q_boxplot"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {roundn_sql('min(value)')} AS min_v,
       {roundn_sql('quantile_cont(value, 0.25)')} AS q1,
       {roundn_sql('quantile_cont(value, 0.5)')} AS median_v,
       {roundn_sql('quantile_cont(value, 0.75)')} AS q3,
       {roundn_sql('max(value)')} AS max_v
FROM events GROUP BY event_type"""


def q_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``median_absolute_deviation``: median(|value - median(value)|)
    per event type. Two passes over events; the per-type medians are a
    k-row broadcast between them."""
    from elasticsearch_hbase_river_spark.sources.tables import load_events
    ev = load_events(spark, sf_dir)
    med = (ev.groupBy("event_type")
           .agg(F.expr("percentile(value, 0.5)").alias("med")))
    return (ev.join(F.broadcast(med), "event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 roundn_col(F.min("med")).alias("median_v"),
                 roundn_col(F.expr("percentile(abs(value - med), 0.5)"))
                 .alias("mad")))


QUERIES["q_median_abs_deviation"] = q_median_abs_deviation

ORACLES["q_median_abs_deviation"] = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {roundn_sql('min(med)')} AS median_v,
       {roundn_sql('quantile_cont(abs(value - med), 0.5)')} AS mad
FROM events JOIN med USING (event_type)
GROUP BY event_type"""


def q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``weighted_avg`` per event type: ``value`` weighted by a
    per-user importance weight ((user_id % {WA_MOD}) + 1 here; a real
    deployment joins its own weight field). Exact decimal numerator."""
    from elasticsearch_hbase_river_spark.sources.tables import load_events
    ev = load_events(spark, sf_dir)
    w = (F.col("user_id") % WA_MOD + 1).cast("long")
    dec = F.col("value").cast("decimal(18,2)")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(w).cast("long").alias("sum_w"),
                 roundn_col(F.sum(dec * w).cast("double")
                            / F.sum(w).cast("double")).alias("weighted_avg")))


QUERIES["q_weighted_avg"] = q_weighted_avg

ORACLES["q_weighted_avg"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum((user_id % {WA_MOD}) + 1) AS BIGINT) AS sum_w,
       {roundn_sql(f"CAST(sum(CAST(value AS DECIMAL(18,2))"
                   f" * ((user_id % {WA_MOD}) + 1)) AS DOUBLE)"
                   f" / CAST(sum((user_id % {WA_MOD}) + 1) AS DOUBLE)")}
         AS weighted_avg
FROM events GROUP BY event_type"""


def q_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``t_test`` aggregation (heteroscedastic / Welch): is the mean
    ``value`` of '{TT_TYPE_A}' events different from '{TT_TYPE_B}'?
    One conditional-aggregate scan down to exact decimal moment sums;
    the t statistic is pure double math on that single row."""
    from elasticsearch_hbase_river_spark.sources.tables import load_events
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin(TT_TYPE_A, TT_TYPE_B))
    dec = F.col("value").cast("decimal(18,2)")
    is_a = F.col("event_type") == TT_TYPE_A

    def moments(cond: F.Column, suffix: str) -> list:
        d = F.when(cond, dec)
        return [F.count(F.when(cond, F.lit(1))).cast("long").alias(f"n_{suffix}"),
                F.sum(d).alias(f"s_{suffix}"),
                F.sum(d * d).alias(f"ss_{suffix}")]

    m = ev.agg(*moments(is_a, "a"), *moments(~is_a, "b"))

    def stat(s: str) -> tuple:
        n = F.col(f"n_{s}").cast("double")
        mean = F.col(f"s_{s}").cast("double") / n
        var = ((F.col(f"ss_{s}").cast("double")
                - F.col(f"s_{s}").cast("double")
                * F.col(f"s_{s}").cast("double") / n) / (n - 1.0))
        return n, mean, var

    na, ma, va = stat("a")
    nb, mb, vb = stat("b")
    t = (ma - mb) / F.sqrt(va / na + vb / nb)
    return m.select(
        F.lit(TT_TYPE_A).alias("type_a"), F.lit(TT_TYPE_B).alias("type_b"),
        F.col("n_a"), F.col("n_b"),
        roundn_col(ma).alias("mean_a"), roundn_col(mb).alias("mean_b"),
        roundn_col(t).alias("t_stat"))


QUERIES["q_t_test"] = q_t_test


def _t_test_oracle() -> str:
    def moments(cond: str, s: str) -> str:
        d = f"CASE WHEN {cond} THEN CAST(value AS DECIMAL(18,2)) END"
        return (f"count(CASE WHEN {cond} THEN 1 END) AS n_{s}, "
                f"sum({d}) AS s_{s}, "
                f"sum(({d}) * ({d})) AS ss_{s}")

    def stat(s: str) -> tuple:
        n = f"CAST(n_{s} AS DOUBLE)"
        mean = f"(CAST(s_{s} AS DOUBLE) / {n})"
        var = (f"((CAST(ss_{s} AS DOUBLE) - CAST(s_{s} AS DOUBLE)"
               f" * CAST(s_{s} AS DOUBLE) / {n}) / ({n} - 1.0))")
        return n, mean, var

    na, ma, va = stat("a")
    nb, mb, vb = stat("b")
    t = f"(({ma} - {mb}) / sqrt({va} / {na} + {vb} / {nb}))"
    return f"""
WITH m AS (
  SELECT {moments(f"event_type = '{TT_TYPE_A}'", 'a')},
         {moments(f"event_type = '{TT_TYPE_B}'", 'b')}
  FROM events
  WHERE event_type IN ('{TT_TYPE_A}', '{TT_TYPE_B}'))
SELECT '{TT_TYPE_A}' AS type_a, '{TT_TYPE_B}' AS type_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       {roundn_sql(ma)} AS mean_a, {roundn_sql(mb)} AS mean_b,
       {roundn_sql(t)} AS t_stat
FROM m"""


ORACLES["q_t_test"] = _t_test_oracle()

# ---------------------------------------------------------------------------
# top_metrics, geo_centroid, auto_date_histogram, string_stats — the last
# everyday aggregation shapes.

TM_K = 1  # ES top_metrics default size


def q_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``top_metrics``: per event type, the metric value carried by the
    LATEST event (sort on ts desc; event_id breaks ties deterministically
    — ES leaves sort ties unspecified, this engine does not).

    Scale shape: the standard group-top-k window inside each type's own
    shuffle partition."""
    from elasticsearch_hbase_river_spark.sources.tables import load_events
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc())
    return (ev.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= TM_K)
            .select("event_type", F.col("ts_ms").alias("top_ts_ms"),
                    roundn_col(F.col("value")).alias("top_value")))


QUERIES["q_top_metrics"] = q_top_metrics

ORACLES["q_top_metrics"] = f"""
WITH e AS (SELECT event_id, event_type, value, epoch_ms(ts) AS ts_ms
           FROM events)
SELECT event_type, ts_ms AS top_ts_ms,
       {roundn_sql('value')} AS top_value
FROM (SELECT event_type, ts_ms, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts_ms DESC, event_id DESC) AS r
      FROM e)
WHERE r <= {TM_K}"""


def q_geo_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_centroid`` sub-aggregation under geotile_grid: per tile,
    the member count and centroid (mean lat/lon). The derived coordinates
    are pure-IEEE doubles (no libm), so 4-dp per-row quantization into
    exact decimal sums makes the centroid identical cross-engine."""
    users = _geo_users(spark, sf_dir)
    tx, ty = _tile_sql()
    q = (users.select(F.expr(tx).alias("tile_x"), F.expr(ty).alias("tile_y"),
                      F.expr(roundn_sql("lat", 4)).cast("decimal(18,4)")
                      .alias("lat_r"),
                      F.expr(roundn_sql("lon", 4)).cast("decimal(18,4)")
                      .alias("lon_r")))
    n = F.count(F.lit(1))
    return (q.groupBy("tile_x", "tile_y")
            .agg(n.cast("long").alias("n_users"),
                 roundn_col(F.sum("lat_r").cast("double") / n, 4)
                 .alias("centroid_lat"),
                 roundn_col(F.sum("lon_r").cast("double") / n, 4)
                 .alias("centroid_lon")))


QUERIES["q_geo_centroid"] = q_geo_centroid


# geohash_grid: ES's original geo bucketing — base32 cells from the
# interleaved lon/lat bit expansion (lon takes the even bit positions).
# Precision 4 = 20 bits = 10 per axis; everything below is pure integer
# arithmetic plus substr() into the geohash alphabet, identical SQL text
# in both engines.

GEOHASH_PRECISION = 4
_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_sql(intdiv: str) -> str:
    bits_per_axis = GEOHASH_PRECISION * 5 // 2  # 10 for precision 4
    # least() clamps the inclusive upper boundary (lat=90 / lon=180 would
    # otherwise index one past the last cell).
    hi = 2 ** bits_per_axis - 1
    lon_b = (f"least({hi}, CAST(floor((lon + 180e0) / 360e0"
             f" * {2 ** bits_per_axis}) AS BIGINT))")
    lat_b = (f"least({hi}, CAST(floor((lat + 90e0) / 180e0"
             f" * {2 ** bits_per_axis}) AS BIGINT))")
    # Interleave: total bit t (MSB-first, t=0 highest) takes lon bit for
    # even t, lat bit for odd t. Axis bit index (from its own MSB) is t//2.
    total_bits = GEOHASH_PRECISION * 5
    chars = []
    for c in range(GEOHASH_PRECISION):
        terms = []
        for b in range(5):
            t = c * 5 + b
            src = lon_b if t % 2 == 0 else lat_b
            axis_bit = t // 2                      # from the axis MSB
            shift = bits_per_axis - 1 - axis_bit   # from the LSB
            terms.append(
                f"((({src} {intdiv} {2 ** shift}) % 2) * {2 ** (4 - b)})")
        v = " + ".join(terms)
        chars.append(f"substr('{_GEOHASH32}', ({v}) + 1, 1)")
    assert total_bits == GEOHASH_PRECISION * 5
    return "CONCAT(" + ", ".join(chars) + ")"


def q_geohash_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geohash_grid`` aggregation at precision {GEOHASH_PRECISION}:
    member counts per base32 geohash cell. The cell id derives from the
    interleaved lon/lat bit expansion — integer-exact, so both engines
    bucket identically; one partial-agg shuffle on the cell."""
    users = _geo_users(spark, sf_dir)
    return (users.select(F.expr(_geohash_sql("div")).alias("geohash"))
            .groupBy("geohash")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


QUERIES["q_geohash_grid"] = q_geohash_grid

def _geohash_grid_oracle() -> str:
    return f"""
WITH geo_users AS ({_geo_users_sql("strpos")})
SELECT {_geohash_sql("//")} AS geohash,
       CAST(count(*) AS BIGINT) AS n_users
FROM geo_users GROUP BY 1"""


ORACLES["q_geohash_grid"] = _geohash_grid_oracle()


def q_geo_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_bounds`` sub-aggregation under geotile_grid: the bounding
    box (min/max lat/lon) of each tile's members plus the member count —
    pure min/max of IEEE-exact doubles, no rounding needed."""
    users = _geo_users(spark, sf_dir)
    tx, ty = _tile_sql()
    return (users.select(F.expr(tx).alias("tile_x"),
                         F.expr(ty).alias("tile_y"), "lat", "lon")
            .groupBy("tile_x", "tile_y")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.min("lat").alias("south"), F.max("lat").alias("north"),
                 F.min("lon").alias("west"), F.max("lon").alias("east")))


QUERIES["q_geo_bounds"] = q_geo_bounds


def _geo_bounds_oracle() -> str:
    tx, ty = _tile_sql()
    return f"""
WITH geo_users AS ({_geo_users_sql("strpos")})
SELECT {tx} AS tile_x, {ty} AS tile_y,
       CAST(count(*) AS BIGINT) AS n_users,
       min(lat) AS south, max(lat) AS north,
       min(lon) AS west, max(lon) AS east
FROM geo_users GROUP BY 1, 2"""


ORACLES["q_geo_bounds"] = _geo_bounds_oracle()


def _geo_centroid_oracle() -> str:
    tx, ty = _tile_sql()
    return f"""
WITH geo_users AS ({_geo_users_sql("strpos")}),
q AS (SELECT {tx} AS tile_x, {ty} AS tile_y,
             CAST({roundn_sql('lat', 4)} AS DECIMAL(18,4)) AS lat_r,
             CAST({roundn_sql('lon', 4)} AS DECIMAL(18,4)) AS lon_r
      FROM geo_users)
SELECT tile_x, tile_y, CAST(count(*) AS BIGINT) AS n_users,
       {roundn_sql('CAST(sum(lat_r) AS DOUBLE) / count(*)', 4)}
         AS centroid_lat,
       {roundn_sql('CAST(sum(lon_r) AS DOUBLE) / count(*)', 4)}
         AS centroid_lon
FROM q GROUP BY tile_x, tile_y"""


ORACLES["q_geo_centroid"] = _geo_centroid_oracle()

# auto_date_histogram: ES picks the smallest calendar interval that keeps
# the bucket count at or under the target. Pure integer arithmetic over
# epoch millis, so both engines pick the identical interval.

ADH_TARGET = 20
ADH_LADDER_MS = (1_000, 5_000, 10_000, 30_000, 60_000, 300_000, 600_000,
                 1_800_000, 3_600_000, 10_800_000, 43_200_000, 86_400_000,
                 604_800_000, 2_592_000_000, 7_776_000_000, 31_536_000_000)


def _adh_interval_case(span: str, intdiv: str) -> str:
    """SQL CASE choosing the smallest ladder interval whose bucket count
    ceil((span+1)/interval) stays at or under the target — pure integer
    arithmetic (``intdiv``: Spark ``div``, DuckDB ``//``)."""
    whens = " ".join(
        f"WHEN (({span} + {iv}) {intdiv} {iv}) <= {ADH_TARGET} THEN {iv}"
        for iv in ADH_LADDER_MS[:-1])
    return f"(CASE {whens} ELSE {ADH_LADDER_MS[-1]} END)"


def q_auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``auto_date_histogram``: bucket events so that at most
    {ADH_TARGET} buckets result, picking the interval from a fixed ladder
    (integer arithmetic over epoch millis, so both engines pick the
    identical interval; the chosen interval rides along in every output
    row, as ES reports it).

    Scale shape: a 1-row min/max aggregate broadcasts into the bucket
    expression; the corpus pays one partial-agg shuffle on the bucket."""
    from elasticsearch_hbase_river_spark.sources.tables import load_events
    ev = load_events(spark, sf_dir)
    bounds = ev.agg(F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"))
    case = _adh_interval_case("(hi - lo)", "div")
    b = ev.crossJoin(F.broadcast(bounds)).select(
        F.expr(case).cast("long").alias("interval_ms"),
        F.expr(f"CAST(lo + (((ts_ms - lo) div {case}) * {case}) AS BIGINT)")
        .alias("bucket_start"))
    return (b.groupBy("interval_ms", "bucket_start")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events")))


QUERIES["q_auto_date_histogram"] = q_auto_date_histogram


def _adh_oracle() -> str:
    case = _adh_interval_case("(hi - lo)", "//")
    return f"""
WITH e AS (SELECT epoch_ms(ts) AS ts_ms FROM events),
bounds AS (SELECT min(ts_ms) AS lo, max(ts_ms) AS hi FROM e)
SELECT CAST({case} AS BIGINT) AS interval_ms,
       CAST(lo + (((ts_ms - lo) // {case}) * {case}) AS BIGINT)
         AS bucket_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM e CROSS JOIN bounds
GROUP BY 1, 2"""


ORACLES["q_auto_date_histogram"] = _adh_oracle()


def q_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``string_stats`` (with ``show_distribution``'s entropy) per
    language: doc count, min/avg/max length, and the Shannon entropy of
    the analyzed-token distribution — the corpus-quality signal a
    curation pipeline reads per language slice.

    Scale shape: postings partial-agg to (lang, token) counts
    (vocab x languages rows), entropy is a second tiny agg over that."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (_postings(docs).join(docs.select("doc_id", "lang"), "doc_id")
           .groupBy("lang", "token")
           .agg(F.count(F.lit(1)).alias("c")))
    wl = Window.partitionBy("lang")
    ent = (tok.withColumn("tot", F.sum("c").over(wl))
           .groupBy("lang")
           .agg(roundn_col(-F.sum((F.col("c") / F.col("tot"))
                                  * (F.log(F.col("c") / F.col("tot"))
                                     / F.lit(_LN2)))).alias("token_entropy"),
                F.first("tot").cast("long").alias("n_tokens")))
    lens = (docs.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("n_chars").cast("long").alias("min_len"),
                 F.max("n_chars").cast("long").alias("max_len"),
                 roundn_col(F.sum("n_chars").cast("double")
                            / F.count(F.lit(1))).alias("avg_len")))
    return lens.join(ent, "lang")


QUERIES["q_string_stats"] = q_string_stats

# ---------------------------------------------------------------------------
# _explain — ES's score-explanation API: the per-term BM25 contribution
# breakdown for the top-ranked hits of the fixed query (same corpus
# relations as q_bm25; the explain surface just refuses to collapse the
# per-term contributions before ranking).


def q_explain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elasticsearch_hbase_river_spark.operators.search import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOP,
        _corpus_stats,
        _dl_col,
    )
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", _dl_col().alias("dl"))
    tf = (_postings(docs)
          .filter(F.col("token").isin(*BM25_TERMS))
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1
        * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
    contrib = (tf.join(F.broadcast(df_), "token")
               .join(dl, "doc_id")
               .crossJoin(F.broadcast(_corpus_stats(docs)))
               .select("doc_id", "token", (idf * tf_norm).alias("c")))
    per_doc = contrib.groupBy("doc_id").agg(
        *[roundn_col(F.sum(F.when(F.col("token") == t, F.col("c"))
                           .otherwise(0.0))).alias(f"c_{t}")
          for t in BM25_TERMS],
        roundn_col(F.sum("c")).alias("score"))
    return (per_doc.orderBy(F.col("score").desc(), "doc_id")
            .limit(BM25_TOP))


QUERIES["q_explain_score"] = q_explain_score


def _explain_oracle() -> str:
    from elasticsearch_hbase_river_spark.operators.search import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOP,
        _DL_SQL,
    )
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    ccols = ", ".join(
        roundn_sql(f"sum(CASE WHEN token = '{t}' THEN c ELSE 0.0 END)")
        + f" AS c_{t}" for t in BM25_TERMS)
    return f"""
WITH tok AS ({_POSTINGS_SQL}),
dl AS (SELECT doc_id, CAST({_DL_SQL} AS BIGINT) AS dl FROM documents),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 avg({_DL_SQL}) AS avgdl FROM documents),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ({terms}) GROUP BY doc_id, token),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
contrib AS (
  SELECT tf.doc_id, tf.token,
         ln(1.0 + (stats.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
         * (tf.tf * ({BM25_K1} + 1)) /
           (tf.tf + {BM25_K1}
            * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dfr USING (token) JOIN dl USING (doc_id)
  CROSS JOIN stats)
SELECT doc_id, {ccols}, {roundn_sql('sum(c)')} AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT {BM25_TOP}"""


ORACLES["q_explain_score"] = _explain_oracle()

# multi_terms aggregation: top-N buckets keyed on a COMPOSITE of fields,
# ranked by count — the shape `terms` can't express without a script.

MT_TOP = 15
_DAY_MS = 86_400_000


def q_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``multi_terms``: top-{MT_TOP} (event_type, day) buckets by doc
    count, deterministic (count desc, keys) ordering — one partial-agg
    shuffle then a bounded TakeOrdered."""
    from elasticsearch_hbase_river_spark.sources.tables import load_events
    ev = load_events(spark, sf_dir)
    return (ev.select("event_type",
                      F.expr(f"ts_ms div {_DAY_MS}").alias("day"))
            .groupBy("event_type", "day")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "event_type", "day")
            .limit(MT_TOP))


QUERIES["q_multi_terms"] = q_multi_terms

ORACLES["q_multi_terms"] = f"""
WITH e AS (SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS day FROM events)
SELECT event_type, CAST(day AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY event_type, day
ORDER BY n DESC, event_type, day LIMIT {MT_TOP}"""


ORACLES["q_string_stats"] = f"""
WITH tok AS ({_POSTINGS_SQL}),
tc AS (
  SELECT d.lang, t.token, count(*) AS c
  FROM tok t JOIN documents d USING (doc_id)
  GROUP BY d.lang, t.token),
ent AS (
  SELECT lang,
         {roundn_sql(f"-sum((c * 1.0 / tot) * (ln(c * 1.0 / tot) / {_LN2!r}))")}
           AS token_entropy,
         CAST(min(tot) AS BIGINT) AS n_tokens
  FROM (SELECT lang, c, sum(c) OVER (PARTITION BY lang) AS tot FROM tc)
  GROUP BY lang),
lens AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(n_chars) AS BIGINT) AS min_len,
         CAST(max(n_chars) AS BIGINT) AS max_len,
         {roundn_sql('CAST(sum(n_chars) AS DOUBLE) / count(*)')} AS avg_len
  FROM documents GROUP BY lang)
SELECT lang, n_docs, min_len, max_len, avg_len, token_entropy, n_tokens
FROM lens JOIN ent USING (lang)"""
