"""Invariant tests for DSL packs 8/9 and the CCNet curation pack —
properties the oracle hash-compare can't express (the queries' value
parity is covered by the auto-parametrized `test_oracle_parity.py`).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_hbase_river_spark.operators.esdsl8 import (
    HEX_SIZE_DEG,
    INT8_TOP,
    _hex_steps,
)

# ---------------------------------------------------------------------------
# geohex: the cube-rounding construction, evaluated in pure Python from
# the SAME expression steps the engines run (public axial-hex golden
# math: round-tripping a cell's own center must return the cell).


def _hex_cell(lat: float, lon: float) -> tuple[int, int]:
    """Evaluate the shared (name, expr) steps on DuckDB — the EXACT
    expression text one of the two engines runs, no re-implementation."""
    import duckdb

    sel = (f"SELECT CAST({lat!r} AS DOUBLE) AS lat,"
           f" CAST({lon!r} AS DOUBLE) AS lon")
    for name, expr in _hex_steps("lat", "lon"):
        sel = f"SELECT *, {expr} AS {name} FROM ({sel})"
    q, r = duckdb.sql(f"SELECT hq, hr FROM ({sel})").fetchone()
    return int(q), int(r)


SQRT3_3 = math.sqrt(3.0) / 3.0


def _cell_center(hq: int, hr: int) -> tuple[float, float]:
    """Invert the axial transform at the lattice point (pointy-top)."""
    s = HEX_SIZE_DEG
    lat = hr * s * 1.5
    lon = (hq * s + lat / 3.0) / SQRT3_3
    return lat, lon


@settings(max_examples=60, deadline=None)
@given(st.integers(-5, 5), st.integers(-5, 5))
def test_geohex_center_roundtrip(hq, hr):
    lat, lon = _cell_center(hq, hr)
    assert _hex_cell(lat, lon) == (hq, hr)


def _hex_cell_ref(lat: float, lon: float) -> tuple[int, int]:
    """Independent pure-Python cube-rounding reference (the published
    construction, written WITHOUT looking at the SQL steps) — pins the
    engines' shared expression text against a second implementation."""
    s = HEX_SIZE_DEG
    qf = (SQRT3_3 * lon - lat / 3.0) / s
    rf = (2.0 * lat / 3.0) / s
    x, z = qf, rf
    y = -x - z
    rx, ry, rz = (math.floor(v + 0.5) for v in (x, y, z))
    dx, dy, dz = abs(rx - x), abs(ry - y), abs(rz - z)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        pass          # ry adjusts; q/r outputs unaffected
    else:
        rz = -rx - ry
    return int(rx), int(rz)


@settings(max_examples=60, deadline=None)
@given(st.floats(-80, 80, allow_nan=False),
       st.floats(-180, 180, allow_nan=False))
def test_geohex_matches_independent_reference(lat, lon):
    assert _hex_cell(lat, lon) == _hex_cell_ref(lat, lon)


@settings(max_examples=40, deadline=None)
@given(st.floats(-70, 70, allow_nan=False),
       st.floats(-170, 170, allow_nan=False))
def test_geohex_cell_contains_point_within_radius(lat, lon):
    """The assigned cell's center is never farther than one hex
    circumradius (in the axial plane's scaled metric) from the point —
    the defining property of cube rounding (nearest lattice point)."""
    hq, hr = _hex_cell(lat, lon)
    clat, clon = _cell_center(hq, hr)
    # distances in fractional axial units of the SAME transform
    s = HEX_SIZE_DEG
    qf = (SQRT3_3 * lon - lat / 3.0) / s
    rf = (2.0 * lat / 3.0) / s
    qc = (SQRT3_3 * clon - clat / 3.0) / s
    rc = (2.0 * clat / 3.0) / s
    # hex (cube) distance from the cell's lattice point must be < 1
    dq, dr = qf - qc, rf - rc
    dy = -dq - dr
    assert max(abs(dq), abs(dr), abs(dy)) <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# Spark-backed invariants (shared session fixtures from conftest).


def test_int8_rescore_recall_against_exact_knn(spark, sf_dir):
    """The quantized candidate pass must not destroy ranking quality:
    rescored top-k vs exact brute-force top-k recall ≥ 0.9 on the
    fixture (per-vector int8 quantization is near-lossless for cosine;
    this pins the OVERSAMPLE WINDOW as big enough)."""
    from elasticsearch_hbase_river_spark.operators.esdsl8 import (
        q_knn_int8_rescore,
    )
    from elasticsearch_hbase_river_spark.operators.similarity import (
        q_knn_cosine,
    )
    got = {(r.qid, r.vec_id)
           for r in q_knn_int8_rescore(spark, sf_dir).collect()}
    exact = {(r.qid, r.vec_id)
             for r in q_knn_cosine(spark, sf_dir).collect()
             if r.rank <= INT8_TOP}
    assert len(exact) > 0
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"int8 rescore recall {recall:.3f}"


def test_eql_sequence_matches_are_ordered_within_maxspan(spark, sf_dir):
    """Every reported user has ≥1 match and the tightest span respects
    the maxspan bound and strict ordering (> 0)."""
    from elasticsearch_hbase_river_spark.operators.esdsl8 import (
        EQL_MAXSPAN_MS,
        q_eql_sequence,
    )
    rows = q_eql_sequence(spark, sf_dir).collect()
    assert rows, "fixture must produce at least one sequence match"
    for r in rows:
        assert r.n_matches >= 1
        assert 0 < r.min_span_ms <= EQL_MAXSPAN_MS


def test_line_dedup_ratio_bounds_and_global_kept_count(spark, sf_dir):
    """retained_ratio ∈ [0, 1] (0 is a real outcome: a doc whose every
    line first appeared elsewhere — the fully-boilerplate case CCNet
    then drops); the total kept lines across the corpus equals the
    number of DISTINCT line hashes (keep-first keeps exactly one
    occurrence per hash)."""
    from elasticsearch_hbase_river_spark.operators.ccnet import (
        _lines,
        q_line_dedup,
    )
    from elasticsearch_hbase_river_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    per = q_line_dedup(spark, sf_dir)
    bad = per.filter((F.col("retained_ratio") < 0)
                     | (F.col("retained_ratio") > 1)
                     | (F.col("n_kept") > F.col("n_lines"))).count()
    assert bad == 0
    total_kept = per.agg(F.sum("n_kept")).first()[0]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_hashes = _lines(docs).select("line_hash").distinct().count()
    assert total_kept == n_hashes


def test_perplexity_terciles_split_docs_three_ways(spark, sf_dir):
    """head/middle/tail buckets are all present and together cover the
    corpus exactly once."""
    from elasticsearch_hbase_river_spark.operators.ccnet import (
        q_perplexity_filter,
    )
    from elasticsearch_hbase_river_spark.sources.tables import load_table

    rows = {r.bucket: r.n_docs
            for r in q_perplexity_filter(spark, sf_dir).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(rows.values()) == n_docs


def test_ks_test_d_stat_in_unit_interval(spark, sf_dir):
    from elasticsearch_hbase_river_spark.operators.esdsl9 import (
        q_bucket_ks_test,
    )
    row = q_bucket_ks_test(spark, sf_dir).first()
    assert row.n_a > 0 and row.n_b > 0
    assert 0.0 <= row.d_stat <= 1.0


def test_search_template_renderer_strict_params():
    import pytest

    from elasticsearch_hbase_river_spark.operators.esdsl9 import (
        render_template,
    )
    out = render_template("a={{x}} b={{y}}", {"x": "1", "y": "2"})
    assert out == {"a": "1", "b": "2"}
    with pytest.raises(ValueError):            # missing param
        render_template("a={{x}}", {})
    with pytest.raises(ValueError):            # unused param
        render_template("a={{x}}", {"x": "1", "z": "9"})


def test_eql_until_voids_are_disjoint_from_matches(spark, sf_dir):
    from elasticsearch_hbase_river_spark.operators.esdsl8 import (
        q_eql_until,
    )
    rows = q_eql_until(spark, sf_dir).collect()
    assert rows, "fixture must produce at least one valid match"
    for r in rows:
        assert r.n_matches >= 1 and r.n_voided >= 0


def test_bucket_correlation_in_range(spark, sf_dir):
    from elasticsearch_hbase_river_spark.operators.esdsl9 import (
        q_bucket_correlation,
    )
    row = q_bucket_correlation(spark, sf_dir).first()
    assert row.n > 1
    assert -1.0 <= row.pearson_r <= 1.0
