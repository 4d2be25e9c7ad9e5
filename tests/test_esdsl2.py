"""Semantics pins for the second ES-DSL pack (esdsl2.py) beyond the oracle
hash-compare: the decay curve's fixed points, the adjacency pair expansion
vs its relational definition, and the parent-join gates."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.operators.esdsl2 import (
    FS_ORIGIN,
    FS_SCALE,
    HC_MIN_CHILDREN,
    q_adjacency_matrix,
    q_has_child,
    q_nested_match,
    NESTED_QUALIFIER,
    NESTED_VALUE_PREFIX,
)


def test_gauss_decay_fixed_points(spark):
    """ES gauss decay contract: 1.0 at the origin, exactly ``decay`` (0.5)
    at |x - origin| = scale — the two points users configure by."""
    df = spark.range(1).select(
        *[F.exp(-((F.lit(float(x)) - FS_ORIGIN) * (F.lit(float(x)) - FS_ORIGIN))
                * F.lit(math.log(2.0)) / F.lit(FS_SCALE * FS_SCALE)).alias(f"g{i}")
          for i, x in enumerate([FS_ORIGIN, FS_ORIGIN + FS_SCALE,
                                 FS_ORIGIN - FS_SCALE])])
    row = df.first()
    assert row.g0 == 1.0
    assert math.isclose(row.g1, 0.5, rel_tol=1e-12)
    assert math.isclose(row.g2, 0.5, rel_tol=1e-12)


def test_adjacency_matrix_equals_selfjoin_definition(spark, sf_dir):
    """The map-side pair expansion (groupBy user -> sorted type set ->
    per-set pair explode) must equal the textbook definition: a distinct
    (user, type) self-join counted per unordered pair."""
    got = {(r.key, r.doc_count)
           for r in q_adjacency_matrix(spark, sf_dir).collect()}
    r = (spark.read.parquet(f"{sf_dir}/events.parquet")
         .select("user_id", "event_type").distinct().persist())
    singles = {(row.event_type, row.cnt) for row in
               r.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    a, b = r.alias("a"), r.alias("b")
    pairs = {(f"{row.ta}&{row.tb}", row.cnt) for row in
             a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.event_type") < F.col("b.event_type")))
             .groupBy(F.col("a.event_type").alias("ta"),
                      F.col("b.event_type").alias("tb"))
             .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    r.unpersist()
    assert got == singles | pairs


def test_has_child_respects_min_children(spark, sf_dir):
    rows = q_has_child(spark, sf_dir).collect()
    assert rows, "expected at least one parent hit"
    assert all(r.n_children >= HC_MIN_CHILDREN for r in rows)


def test_nested_match_is_per_element_not_cross_field(spark):
    """Block-join semantics: a parent whose qualifier predicate matches in
    one element and value predicate in ANOTHER must not match. Build a
    synthetic cells relation and run the same filter shape."""
    cells = spark.createDataFrame(
        [("r1", NESTED_QUALIFIER, NESTED_VALUE_PREFIX + "1}"),   # both, same cell
         ("r2", NESTED_QUALIFIER, "no-match"),                   # qualifier only
         ("r2", "other", NESTED_VALUE_PREFIX + "2}"),            # value only
         ("r3", "other", "no-match")],
        "row_key string, qualifier string, value string")
    matched = cells.filter(
        (F.col("qualifier") == NESTED_QUALIFIER)
        & F.col("value").startswith(NESTED_VALUE_PREFIX))
    assert [r.row_key for r in matched.collect()] == ["r1"]


def test_nested_match_inner_hits_satisfy_both_predicates(spark, sf_dir):
    rows = q_nested_match(spark, sf_dir).collect()
    assert rows, "expected nested matches in the fixture"
    assert all(r.inner_hit.startswith(NESTED_VALUE_PREFIX) for r in rows)


def test_english_analyzer_stems_and_stops_identically_in_both_engines(spark):
    """The english chain (stop filter + S-stemmer) must produce identical
    token arrays in Spark and DuckDB over dirty text, and obey the
    S-stemmer rules: ies->y, es->e, plural s dropped, us/ss kept,
    stopwords removed with duplicates preserved."""
    import duckdb

    from elasticsearch_hbase_river_spark.functions.analyzer import (
        analyze_tokens_en,
        analyze_toks_en_sql,
    )

    texts = [
        "The Queries and the Tables!",
        "Sparks, classes; the bus hits glass",
        "a a a joins",
        "THE AND OF",          # all stopwords -> empty
        "",                    # empty -> empty
    ]
    sp = [r.toks for r in
          spark.createDataFrame([(t,) for t in texts], "text string")
          .select(analyze_tokens_en(F.col("text")).alias("toks")).collect()]
    con = duckdb.connect()
    du = [r[0] for r in con.execute(
        f"SELECT {analyze_toks_en_sql('t')} FROM (SELECT unnest(?) AS t)",
        [texts]).fetchall()]
    assert sp == du
    assert sp[0] == ["query", "table"]
    assert sp[1] == ["spark", "classe", "bus", "hit", "glass"]
    assert sp[2] == ["join"]
    assert sp[3] == [] and sp[4] == []
