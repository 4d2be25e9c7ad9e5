"""ES query-DSL pack 6: relational aggs over the river's own document
model (missing / children / reverse_nested) and the remaining geo/ip
surfaces (geo_line, ip_prefix, geo_bounding_box, geo_polygon).

The reference turns HBase rows into nested ES documents
(`HBaseParser.java:204-244`) whose dynamic mapping then serves the whole
agg DSL (`HBaseRiver.java:217-232`); packs 1-5 cover the term/full-text,
bucket/metric/pipeline, span, suggest and multi-search families. This
pack closes the document-structure and geo/ip gaps:

Document-structure aggs (over the river's assembled corpora):
- ``q_missing_agg``    : ES ``missing`` agg per discovered field path —
  how many ASSEMBLED documents lack each field (the complement of
  ``q_exists_field`` against the sparse nested corpus, `nesteddoc.py`).
- ``q_children_agg``   : ES ``children`` agg — parent buckets (order
  priority) descend into their child documents (lineitems): child doc
  count + child metric per parent bucket.
- ``q_reverse_nested`` : ES ``reverse_nested`` — bucket by a NESTED
  member field (lineitem return flag), then step back up to the parent
  level: parent doc count + a parent-level metric per nested bucket.

Geo / ip:
- ``q_geo_line``          : ES ``geo_line`` agg — per-user trajectory
  from their time-ordered event points: point count, track length (km),
  first/last timestamp.
- ``q_ip_prefix``         : ES ``ip_prefix`` agg — synthetic stable
  per-user IPv4 (md5-derived, the same fixture convention as the geo
  points, `esdsl3.py`), bucketed by /8 prefix.
- ``q_geo_bounding_box``  : ES ``geo_bounding_box`` query — pure
  map-side rectangle filter on the per-user points.
- ``q_geo_polygon``       : ES ``geo_polygon`` query — point-in-triangle
  by the cross-product sign test (identical IEEE arithmetic in both
  engines; no trigonometry).

Scale shapes: the structure aggs are one partial-agg shuffle each
(``q_missing_agg``'s corpus total is a 1-row broadcast); the
parent/child walks are keyed equi-joins on the parent key — never
broadcast-corpus, never cartesian. ``q_geo_line`` orders WITHIN user
(window partitioned by user_id; segment distances are 6-dp-snapped and
summed as DECIMAL so the per-user total is addition-order-free). The
geo filters are stateless map-side predicates: at 100 TB they ride the
scan with zero shuffle.

Float outputs go through the portable ``floor(x*1eN+0.5)/1eN`` rounding
(`functions/determinism.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import (
    roundn_col,
    roundn_sql,
)
from elasticsearch_hbase_river_spark.operators.esdsl3 import (
    _geo_users,
    _geo_users_sql,
    _h16_sql,
    _haversine_sql,
)
from elasticsearch_hbase_river_spark.operators.nesteddoc import (
    _FIELDED_CTES,
    fielded_cells,
)
from elasticsearch_hbase_river_spark.sources.tables import (
    load_events,
    load_table,
)

QUERIES: dict = {}
ORACLES: dict = {}

# ---------------------------------------------------------------------------
# missing — per-field complement of exists over the assembled corpus.

def q_missing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``missing`` agg per discovered field path: assembled documents
    NOT carrying the field (null/empty counts as missing, as in ES).
    The exists side is one |fields|-group shuffle; the corpus total is
    the source-row count — every source row assembles into exactly one
    document (the sparse melt always emits its ``meta`` cells,
    `nesteddoc.py:sparse_melt`), so the total is a shuffle-free
    count-star, NOT a corpus-wide distinct over the melted cells
    (measured: the distinct made this 57 s at sf3; the count-star form
    is ~10 s cold). missing = total − exists needs no per-doc anti-join."""
    fc = fielded_cells(spark, sf_dir)
    total = (load_table(spark, sf_dir, "events")
             .agg(F.count(F.lit(1)).cast("long").alias("n_total")))
    exists = (fc.filter(F.col("value").isNotNull() & (F.col("value") != ""))
              .groupBy("field")
              .agg(F.count(F.lit(1)).cast("long").alias("doc_count")))
    return (exists.join(F.broadcast(total))
            .select("field",
                    (F.col("n_total") - F.col("doc_count")).cast("long")
                    .alias("missing_count")))


# The fielded-cells CTE chain is nesteddoc.py's oracle spec; reuse it.
ORACLES["q_missing_agg"] = f"""
WITH {_FIELDED_CTES},
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM events),
ex AS (
  SELECT field, CAST(count(*) AS BIGINT) AS doc_count
  FROM fcells WHERE value IS NOT NULL AND value <> ''
  GROUP BY field)
SELECT field, CAST(n_total - doc_count AS BIGINT) AS missing_count
FROM ex CROSS JOIN total"""

# ---------------------------------------------------------------------------
# children / reverse_nested — structure-walking aggs on orders/lineitem.

CHILD_MIN_QTY = 30


def q_children_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``children`` agg: parent buckets (order priority) descend into
    their CHILD documents — per priority, the count of child lineitems
    with quantity ≥ {CHILD_MIN_QTY} and their summed quantity. The child
    filter is map-side; the parent walk is one keyed equi-join on the
    order key followed by a |priorities|-group aggregation."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_quantity") >= CHILD_MIN_QTY)
          .select("l_orderkey",
                  F.col("l_quantity").cast("decimal(18,2)").alias("qty")))
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    return (li.join(orders, "l_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_children"),
                 F.sum("qty").cast("double").alias("sum_qty_raw"))
            .select("o_orderpriority", "n_children",
                    roundn_col(F.col("sum_qty_raw")).alias("sum_qty")))


ORACLES["q_children_agg"] = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_children,
       {roundn_sql("CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))"
                   " AS DOUBLE)")} AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity >= {CHILD_MIN_QTY}
GROUP BY o_orderpriority"""


def q_reverse_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``reverse_nested``: bucket by a NESTED member field (lineitem
    return flag), then step back to the PARENT level — per flag, the
    nested member count, the count of DISTINCT parent orders, and a
    parent-level metric (average order totalprice over the distinct
    parents). The parent metric must not double-count parents with
    several members in the bucket, so the walk dedups (bucket, parent)
    before the parent join — exactly ES's join-back-to-parent-scope
    semantics."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("return_flag"), "l_orderkey")
    members = li.groupBy("return_flag", "l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_in_parent"))
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("tp"))
    return (members.join(orders, "l_orderkey")
            .groupBy("return_flag")
            .agg(F.sum("n_in_parent").cast("long").alias("n_members"),
                 F.count(F.lit(1)).cast("long").alias("n_parents"),
                 roundn_col(F.sum("tp").cast("double")
                            / F.count(F.lit(1))).alias("avg_parent_price")))


ORACLES["q_reverse_nested"] = f"""
WITH members AS (
  SELECT l_returnflag AS return_flag, l_orderkey,
         CAST(count(*) AS BIGINT) AS n_in_parent
  FROM lineitem GROUP BY 1, 2)
SELECT return_flag, CAST(sum(n_in_parent) AS BIGINT) AS n_members,
       CAST(count(*) AS BIGINT) AS n_parents,
       {roundn_sql("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))"
                   " AS DOUBLE) / count(*)")} AS avg_parent_price
FROM members JOIN orders ON l_orderkey = o_orderkey
GROUP BY return_flag"""

# ---------------------------------------------------------------------------
# geo_line — per-user trajectory over time-ordered event points.

def q_geo_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_line`` agg: each user's events become a time-ordered
    track; per user — point count, total track length (km) and the
    first/last timestamps. Points are the per-EVENT analog of the
    per-user fixture points (md5 of the event id — fixture plumbing,
    same convention as `esdsl3.py`). The lag window partitions BY USER
    (never global); each segment distance is snapped to the 6-dp grid
    and summed as DECIMAL, so the per-user total is independent of
    Spark's aggregation order."""
    ev = load_events(spark, sf_dir)
    lat16 = _h16_sql("lat", "instr").replace("user_id", "event_id")
    lon16 = _h16_sql("lon", "instr").replace("user_id", "event_id")
    pts = ev.select(
        "user_id", "event_id", "ts_ms",
        F.expr(f"-80e0 + 160e0 * ({lat16} / 65536e0)").alias("lat"),
        F.expr(f"-180e0 + 360e0 * ({lon16} / 65536e0)").alias("lon"))
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seg = pts.select(
        "user_id", "ts_ms", "lat", "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"))
    dist = F.expr(_haversine_sql("plat", "plon", "lat", "lon"))
    seg_km = (F.when(F.col("plat").isNull(), F.lit(0.0))
              .otherwise(roundn_col(dist))).cast("decimal(18,6)")
    return (seg.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.sum(seg_km).cast("double").alias("track_km"),
                 F.min("ts_ms").alias("first_ts_ms"),
                 F.max("ts_ms").alias("last_ts_ms")))


def _geo_line_oracle() -> str:
    lat16 = _h16_sql("lat", "strpos", "VARCHAR").replace("user_id",
                                                         "event_id")
    lon16 = _h16_sql("lon", "strpos", "VARCHAR").replace("user_id",
                                                         "event_id")
    dist = _haversine_sql("plat", "plon", "lat", "lon")
    return f"""
WITH pts AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         (-80e0 + 160e0 * ({lat16} / 65536e0)) AS lat,
         (-180e0 + 360e0 * ({lon16} / 65536e0)) AS lon
  FROM events),
seg AS (
  SELECT user_id, ts_ms, lat, lon,
         lag(lat) OVER (PARTITION BY user_id
                        ORDER BY ts_ms, event_id) AS plat,
         lag(lon) OVER (PARTITION BY user_id
                        ORDER BY ts_ms, event_id) AS plon
  FROM pts)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(CAST(CASE WHEN plat IS NULL THEN 0.0
                      ELSE {roundn_sql(dist)} END
                 AS DECIMAL(18,6))) AS DOUBLE) AS track_km,
       min(ts_ms) AS first_ts_ms, max(ts_ms) AS last_ts_ms
FROM seg GROUP BY user_id"""


ORACLES["q_geo_line"] = _geo_line_oracle()

# ---------------------------------------------------------------------------
# ip_prefix — /8 buckets over synthetic stable per-user IPv4s.

IP_PREFIX_LEN = 8


def q_ip_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``ip_prefix`` agg with ``prefix_length: {IP_PREFIX_LEN}``:
    each user gets a stable synthetic IPv4 (two md5-derived 16-bit
    halves — fixture plumbing, the geo-point convention); buckets are
    the /8 prefixes with user and event counts. The octet derivation is
    map-side integer math on the event scan; one |prefixes|-group
    shuffle."""
    ev = load_events(spark, sf_dir)
    ipa = _h16_sql("ipa", "instr")           # high 16 bits: a.b octets
    a = F.expr(f"CAST(({ipa}) div 256 AS BIGINT)")
    per = ev.select(a.alias("octet_a"), "user_id", "event_id")
    return (per.groupBy("octet_a")
            .agg(F.countDistinct("user_id").cast("long").alias("n_users"),
                 F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(F.concat(F.col("octet_a").cast("string"),
                             F.lit(".0.0.0/8")).alias("prefix"),
                    "n_users", "n_events"))


def _ip_prefix_oracle() -> str:
    ipa = _h16_sql("ipa", "strpos", "VARCHAR")
    return f"""
SELECT concat(CAST(({ipa}) // 256 AS VARCHAR), '.0.0.0/8') AS prefix,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1"""


ORACLES["q_ip_prefix"] = _ip_prefix_oracle()

# ---------------------------------------------------------------------------
# geo_bounding_box / geo_polygon — stateless map-side point filters.

BBOX = (-10.0, 40.0, -60.0, 60.0)   # lat_min, lat_max, lon_min, lon_max

#: Triangle for the polygon test (lat, lon) — big enough to catch a
#: stable fraction of the uniform fixture points.
POLY = ((60.0, -150.0), (-50.0, -100.0), (55.0, 30.0))


def q_geo_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_bounding_box`` query: per-user points inside the
    rectangle {BBOX} — a stateless map-side predicate over the user
    point relation (at 100 TB this rides the scan; no shuffle beyond the
    distinct-user derivation the point synthesis needs)."""
    users = _geo_users(spark, sf_dir)
    return (users.filter(
        (F.col("lat") >= BBOX[0]) & (F.col("lat") <= BBOX[1])
        & (F.col("lon") >= BBOX[2]) & (F.col("lon") <= BBOX[3]))
        .select("user_id", roundn_col(F.col("lat")).alias("lat"),
                roundn_col(F.col("lon")).alias("lon")))


ORACLES["q_geo_bounding_box"] = f"""
WITH geo_users AS ({_geo_users_sql("strpos")})
SELECT user_id, {roundn_sql('lat')} AS lat, {roundn_sql('lon')} AS lon
FROM geo_users
WHERE lat >= {BBOX[0]} AND lat <= {BBOX[1]}
  AND lon >= {BBOX[2]} AND lon <= {BBOX[3]}"""


def _cross_sql(ax, ay, bx, by, px="lat", py="lon") -> str:
    """Sign of the cross product (B−A)×(P−A) in (lat, lon) coordinates —
    pure IEEE multiply/subtract, identical in both engines."""
    return (f"(({bx} - {ax}) * ({py} - {ay})"
            f" - ({by} - {ay}) * ({px} - {ax}))")


def _triangle_orientation() -> float:
    """Sign of the POLY winding, computed ONCE at the driver — lets the
    point test reference each edge cross product a single time."""
    (a, b, c) = POLY
    return ((b[0] - a[0]) * (c[1] - a[1])
            - (b[1] - a[1]) * (c[0] - a[0]))


def _in_triangle_sql() -> str:
    # Each d_i appears ONCE: the lat/lon operands are md5-derived
    # expressions that Catalyst re-inlines per reference (measured 17.7 s
    # → 4.4 s at sf1 going from the 12-reference NOT(any<0 AND any>0)
    # form to this 6-reference one). The winding sign is a driver-side
    # constant, so "all same sign as the winding" is a single
    # greatest()/least() comparison.
    (a, b, c) = POLY
    d1 = _cross_sql(a[0], a[1], b[0], b[1])
    d2 = _cross_sql(b[0], b[1], c[0], c[1])
    d3 = _cross_sql(c[0], c[1], a[0], a[1])
    if _triangle_orientation() < 0:     # clockwise: interior d_i <= 0
        return f"greatest({d1}, {d2}, {d3}) <= 0"
    return f"least({d1}, {d2}, {d3}) >= 0"


def q_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_polygon`` query for the triangle {POLY}: point-in-polygon
    by the cross-product sign test (all three edge cross products share
    the winding's sign) — multiply/subtract only, so both engines
    evaluate it bit-identically; no trigonometry, no libm.

    Plan note: the min()-aggregate pushdown barrier this query measured
    (12.6 s → 1.8 s warm at sf1 — the md5-heavy predicate otherwise ran
    once per EVENT) moved into the shared ``_geo_users`` in r12, so the
    whole geo family inherits it."""
    users = _geo_users(spark, sf_dir)
    return (users.filter(F.expr(_in_triangle_sql()))
            .select("user_id", roundn_col(F.col("lat")).alias("lat"),
                    roundn_col(F.col("lon")).alias("lon")))


ORACLES["q_geo_polygon"] = f"""
WITH geo_users AS ({_geo_users_sql("strpos")})
SELECT user_id, {roundn_sql('lat')} AS lat, {roundn_sql('lon')} AS lon
FROM geo_users WHERE {_in_triangle_sql()}"""

# ---------------------------------------------------------------------------

QUERIES.update({
    "q_missing_agg": q_missing_agg,
    "q_children_agg": q_children_agg,
    "q_reverse_nested": q_reverse_nested,
    "q_geo_line": q_geo_line,
    "q_ip_prefix": q_ip_prefix,
    "q_geo_bounding_box": q_geo_bounding_box,
    "q_geo_polygon": q_geo_polygon,
})


# ---------------------------------------------------------------------------
# geo_shape query: indexed points tested against a WKT query polygon with
# an explicit spatial relation — ES's general-geometry query, of which
# geo_polygon (above) is the deprecated special case. The polygon is a
# query literal, so the even-odd ray cast compiles division-free
# (functions/geoshape.py) and the two relations this engine pins
# (`intersects`, the ES default, and `disjoint`) are complements for
# point geometries. A different WKT ring than the triangle, so the two
# geo predicates cover different code paths AND different regions.

GEO_SHAPE_WKT = ("POLYGON ((-120 -20, -40 -45, 60 -10, 40 55, -80 50, "
                 "-120 -20))")


def _geo_shape_hits(spark: SparkSession, sf_dir: str,
                    relation: str) -> DataFrame:
    from elasticsearch_hbase_river_spark.functions.geoshape import (
        parse_wkt_polygon,
        point_in_ring_col,
    )
    ev = load_table(spark, sf_dir, "events")
    lat16, lon16 = _h16_sql("lat", "instr"), _h16_sql("lon", "instr")
    # aggregate-output pin (see q_geo_polygon): the ray cast references
    # lon/lat many times; min() outputs stop Catalyst re-inlining the
    # md5 chain per reference / per event
    users = (ev.select("user_id").distinct()
             .groupBy("user_id")
             .agg(F.min(F.expr(lat16)).alias("h_lat"),
                  F.min(F.expr(lon16)).alias("h_lon"))
             .select("user_id",
                     F.expr("-80e0 + 160e0 * (h_lat / 65536e0)").alias("lat"),
                     F.expr("-180e0 + 360e0 * (h_lon / 65536e0)").alias("lon")))
    inside = point_in_ring_col(F.col("lon"), F.col("lat"),
                               parse_wkt_polygon(GEO_SHAPE_WKT))
    pred = inside if relation == "intersects" else ~inside
    return (users.filter(pred)
            .select("user_id", roundn_col(F.col("lat")).alias("lat"),
                    roundn_col(F.col("lon")).alias("lon")))


def q_geo_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_shape`` query, relation=intersects, against the WKT
    pentagon {GEO_SHAPE_WKT}: a stateless map-side point-in-polygon
    predicate (division-free ray cast — bit-identical in both engines)
    riding the per-user point derivation."""
    return _geo_shape_hits(spark, sf_dir, "intersects")


def q_geo_shape_disjoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_shape`` with relation=disjoint — the complement for
    point geometries; together with q_geo_shape it partitions the user
    set (pinned by the shared oracle construction)."""
    return _geo_shape_hits(spark, sf_dir, "disjoint")


def _geo_shape_oracle(relation: str) -> str:
    from elasticsearch_hbase_river_spark.functions.geoshape import (
        parse_wkt_polygon,
        point_in_ring_sql,
    )
    inside = point_in_ring_sql("lon", "lat",
                               parse_wkt_polygon(GEO_SHAPE_WKT))
    pred = inside if relation == "intersects" else f"NOT ({inside})"
    return f"""
WITH geo_users AS ({_geo_users_sql("strpos")})
SELECT user_id, {roundn_sql('lat')} AS lat, {roundn_sql('lon')} AS lon
FROM geo_users WHERE {pred}"""


QUERIES["q_geo_shape"] = q_geo_shape
QUERIES["q_geo_shape_disjoint"] = q_geo_shape_disjoint
ORACLES["q_geo_shape"] = _geo_shape_oracle("intersects")
ORACLES["q_geo_shape_disjoint"] = _geo_shape_oracle("disjoint")
