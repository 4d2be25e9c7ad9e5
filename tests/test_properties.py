"""Property-based tests (hypothesis) for the pure transform twins —
SURVEY.md §5(c): cheap invariants the ported unit tests can't sweep.

These pin the tricky reference semantics (normalization alphabet,
empty-sub-qualifier collapse, last-write-wins) over arbitrary inputs, and
check the pure-Python twins agree with what the relational twins assume
(e.g. normalization is idempotent, paths are normalize-stable), without
needing a SparkSession — they run in milliseconds.
"""

from __future__ import annotations

import re
import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from elasticsearch_hbase_river_spark.functions.normalize import normalize_field_py
from elasticsearch_hbase_river_spark.functions.qualifier import (
    effective_path,
    find_key_in_data_tree,
    read_data_tree,
)

#: printable-ish text incl. the separator chars the reference ships with
FIELD = st.text(
    alphabet=string.ascii_letters + string.digits + "-_:.&* é",
    max_size=30,
)
SEP = st.sampled_from(["::", ".", "|", None])


def _cell_interior(lo: float, span: float):
    """Coordinates constructed to sit strictly INSIDE a geohash cell: draw
    an integer cell index plus an interior offset in [0.05, 0.95] of the
    cell width. Every drawn example is valid by construction — the old
    strategy drew arbitrary floats and ``assume()``-rejected near-edge
    ones, which failed hypothesis's filter_too_much health check whenever
    the shrinker drifted to round numbers (the round-5 flake)."""
    from elasticsearch_hbase_river_spark.operators.esdsl3 import (
        GEOHASH_PRECISION,
    )

    cells = 2 ** (GEOHASH_PRECISION * 5 // 2)
    return st.builds(
        lambda i, f: lo + (i + f) * span / cells,
        st.integers(min_value=0, max_value=cells - 1),
        st.floats(min_value=0.05, max_value=0.95))


@settings(max_examples=60, deadline=None)
@given(_cell_interior(-90.0, 180.0), _cell_interior(-180.0, 360.0))
@example(90.0, 180.0)       # inclusive upper boundary (least() clamp)
@example(-90.0, -180.0)     # lower corner
@example(0.0, 0.0)          # exact cell edge: floor and >=-bisection agree
@example(90.0, -180.0)
@example(-90.0, 180.0)
def test_geohash_sql_matches_bisection_reference(lat, lon):
    """The bit-interleave geohash encoder (shared SQL text, evaluated
    here through DuckDB) must equal the canonical bisection encoding for
    cell-interior coordinates and the exact domain boundaries. Within a
    float-ulp of a cell edge the multiply-based encoding (Lucene's own)
    and pure bisection legitimately disagree about which side absorbs the
    rounding — the strategy generates interior points by construction, so
    the guard below should never reject (and cannot starve the run)."""
    import duckdb
    from hypothesis import assume

    from elasticsearch_hbase_river_spark.operators.esdsl3 import (
        GEOHASH_PRECISION,
        _GEOHASH32,
        _geohash_sql,
    )

    cells = 2 ** (GEOHASH_PRECISION * 5 // 2)
    for v, span, lo in ((lat, 180.0, -90.0), (lon, 360.0, -180.0)):
        frac = (v - lo) / span * cells
        assume(abs(frac - round(frac)) > 1e-6 or frac == round(frac))

    got = duckdb.sql(
        f"SELECT {_geohash_sql('//')} AS g FROM "
        f"(SELECT {lat!r}::DOUBLE AS lat, {lon!r}::DOUBLE AS lon)"
    ).fetchone()[0]

    lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
    bits, even = [], True
    while len(bits) < GEOHASH_PRECISION * 5:
        if even:
            mid = (lon_i[0] + lon_i[1]) / 2
            bits.append(1 if lon >= mid else 0)
            lon_i = (mid, lon_i[1]) if lon >= mid else (lon_i[0], mid)
        else:
            mid = (lat_i[0] + lat_i[1]) / 2
            bits.append(1 if lat >= mid else 0)
            lat_i = (mid, lat_i[1]) if lat >= mid else (lat_i[0], mid)
        even = not even
    want = "".join(
        _GEOHASH32[int("".join(map(str, bits[i * 5:i * 5 + 5])), 2)]
        for i in range(GEOHASH_PRECISION))
    assert got == want, (lat, lon, got, want)


#: Engine-independent golden vectors for the geo cell encoders. The
#: q_geohash_grid / q_geotile_grid oracles share their generated SQL text
#: between Spark and DuckDB (esdsl3.py), so engine-vs-oracle parity cannot
#: catch an encoder bug — these constants anchor the shared text to
#: known-good PUBLIC values instead.
#:
#: Geohash strings are the published reference examples: geohash.org's
#: canonical demo coordinate (42.605, -5.603) -> "ezs42" and Wikipedia's
#: worked example (57.64911, 10.40744) -> "u4pruydqqvj", truncated to the
#: engine's precision 4; the corners/origin follow from the alphabet
#: definition (all-zero bits -> '0', all-one bits -> 'z', 0N/0E splits
#: upper halves -> 's').
GEOHASH_GOLDEN = (
    (42.605, -5.603, "ezs4"),
    (57.64911, 10.40744, "u4pr"),
    (0.0, 0.0, "s000"),
    (90.0, 180.0, "zzzz"),
    (-90.0, -180.0, "0000"),
)

#: Slippy-map tiles at the engine's zoom 4 (GEO_ZOOM_N = 16), from the
#: OpenStreetMap "Slippy map tilenames" formula evaluated by hand for the
#: wiki's own example coordinate (41.85, -87.65 -> tile 4/5 at z=4), the
#: Wikipedia geohash coordinate, and the origin (0,0 -> the 8/8 tile — the
#: first tile south-east of the equator/meridian crossing).
GEOTILE_GOLDEN = (
    (41.85, -87.65, 4, 5),
    (57.64911, 10.40744, 8, 4),
    (0.0, 0.0, 8, 8),
)


def test_geo_cell_sql_matches_public_golden_vectors():
    """The generated geohash/geotile SQL (the text BOTH engines run) must
    reproduce published known-good cell assignments — the independent
    anchor the shared-implementation oracles need."""
    import duckdb

    from elasticsearch_hbase_river_spark.operators.esdsl3 import (
        _geohash_sql,
        _tile_sql,
    )

    for lat, lon, want in GEOHASH_GOLDEN:
        got = duckdb.sql(
            f"SELECT {_geohash_sql('//')} FROM "
            f"(SELECT {lat!r}::DOUBLE AS lat, {lon!r}::DOUBLE AS lon)"
        ).fetchone()[0]
        assert got == want, (lat, lon, got, want)

    tx, ty = _tile_sql()
    for lat, lon, wx, wy in GEOTILE_GOLDEN:
        gx, gy = duckdb.sql(
            f"SELECT {tx}, {ty} FROM "
            f"(SELECT {lat!r}::DOUBLE AS lat, {lon!r}::DOUBLE AS lon)"
        ).fetchone()
        assert (gx, gy) == (wx, wy), (lat, lon, gx, gy, wx, wy)


@given(FIELD, SEP)
def test_normalize_is_idempotent(name, sep):
    once = normalize_field_py(name, sep)
    assert normalize_field_py(once, sep) == once


@given(FIELD, SEP)
def test_normalize_output_alphabet(name, sep):
    out = normalize_field_py(name, sep)
    allowed = set("abcdefghijklmnopqrstuvwxyz0123456789-_") | set(sep or "")
    assert set(out) <= allowed


@given(FIELD)
def test_normalize_none_separator_matches_reference_truth_table(name):
    # same regex the reference documents: lowercase, keep [a-z0-9\-_]
    assert normalize_field_py(name, None) == re.sub(
        r"[^a-z0-9\-_]", "", name.lower())


@given(st.lists(st.tuples(st.sampled_from(["f1", "f2"]),
                          FIELD.filter(lambda s: normalize_field_py(s, "::")),
                          st.text(max_size=10)),
                min_size=1, max_size=8))
@settings(max_examples=50)
def test_data_tree_last_write_wins(cells):
    """Replaying the same cell list twice gives the same tree, and the last
    value written to any (family, path) is the one visible."""
    tree1 = read_data_tree(cells, "::")
    tree2 = read_data_tree(cells + cells, "::")
    assert tree1 == tree2  # replay idempotence == LWW


@given(FIELD.filter(lambda s: normalize_field_py(s, "::")), st.text(max_size=5))
@settings(max_examples=50)
def test_effective_path_matches_tree_walk(qualifier, value):
    """The flattened ``effective_path`` must agree with where
    ``read_data_tree`` actually places the scalar, whenever the path has no
    empty interior components (those create nested collisions by design)."""
    path = effective_path(qualifier, "::")
    if not all(path):
        return  # interior empty component: reference nests under "" keys
    tree = read_data_tree([("fam", qualifier, value)], "::")
    node = tree["fam"]
    for part in path[:-1]:
        if not isinstance(node, dict):
            return
        node = node[part]
    assert node[path[-1]] == value


@given(st.text(alphabet="ab:", min_size=1, max_size=12))
@settings(max_examples=100)
def test_find_key_round_trip(qualifier):
    """Any scalar placed by read_data_tree at a clean path is findable via
    find_key_in_data_tree with the same separator path."""
    path = effective_path(qualifier, "::")
    if not all(path):
        return
    tree = read_data_tree([("f", qualifier, "v")], "::")
    assert find_key_in_data_tree(tree["f"], "::".join(path), "::") == "v"


def test_karp_rabin_gram_hashes_agree_across_engines_on_edge_inputs(spark):
    """The round-4 integer gram hashing (md5-hex-prefix token hash + Horner
    fold) must produce BIT-IDENTICAL values in Spark and DuckDB on inputs
    beyond the fixture vocabulary: unicode (md5 runs over UTF-8 bytes in
    both), empty/short texts (the whole-text fallback gram), repeated
    tokens, and long texts."""
    import duckdb

    from elasticsearch_hbase_river_spark.operators.dedup import (
        _GH_SQL, _TH_SQL, _gram_hash_df,
    )

    texts = ["", "a", "a b", "a b c", "über straße größe viel",
             "emoji 🎉 test ok done", "x " * 400 + "y",
             "dup dup dup dup", "tab\tin token here"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: sorted(r["gh"])
           for r in _gram_hash_df(df).collect()}

    con = duckdb.connect()
    values = ", ".join(
        f"({i}, '{t}')" for i, t in rows if "'" not in t)
    sql = f"""
    WITH docs(doc_id, text) AS (VALUES {values}),
    thq AS (SELECT doc_id, text, {_TH_SQL} AS th FROM docs),
    ghq AS (SELECT doc_id, {_GH_SQL} AS gh FROM thq)
    SELECT doc_id, gh FROM ghq"""
    want = {r[0]: sorted(r[1]) for r in con.execute(sql).fetchall()}
    assert got == want
