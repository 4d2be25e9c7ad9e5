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
- terms_set: the query's term set broadcasts into a semi-filter on the
  postings; matching is one doc_id-keyed partial agg (count of distinct
  matched terms vs the per-doc threshold, which is map-side column math).
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
    docs = load_table(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in TS_TERMS], ["token"])
    doc_tok = _postings(docs).select("doc_id", "token").distinct()
    matched = (doc_tok.join(F.broadcast(terms), "token")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_matched"),
                    F.array_join(F.array_sort(F.collect_list("token")), ",")
                    .alias("matched_terms")))
    return (docs.select("doc_id", _ts_msm_col().alias("msm"))
            .join(matched, "doc_id")
            .filter(F.col("n_matched") >= F.col("msm"))
            .select("doc_id", "msm", F.col("n_matched").cast("long"),
                    "matched_terms"))


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


def _geo_users_sql(instr: str) -> str:
    lat16 = _h16_sql("lat", instr, "VARCHAR")
    lon16 = _h16_sql("lon", instr, "VARCHAR")
    return (f"SELECT DISTINCT user_id,"
            f" (-80.0 + 160.0 * ({lat16} / 65536.0)) AS lat,"
            f" (-180.0 + 360.0 * ({lon16} / 65536.0)) AS lon"
            f" FROM events")


def _geo_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    lat16, lon16 = _h16_sql("lat", "instr"), _h16_sql("lon", "instr")
    return ev.select("user_id").distinct().select(
        "user_id",
        F.expr(f"-80.0 + 160.0 * ({lat16} / 65536.0)").alias("lat"),
        F.expr(f"-180.0 + 360.0 * ({lon16} / 65536.0)").alias("lon"))


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
