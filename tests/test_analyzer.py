"""Analyzer-chain tests: the search surface must tokenize DIRTY text
identically in both engines (the fixture corpus is pre-clean, so these
tests supply the punctuation/case the fixtures can't).

Reference parity: the analyzer is the field-VALUE twin of the reference's
field-NAME normalization (HBaseRiver.java:314-326, pinned by
HBaseRiverTest.java:37-47)."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.analyzer import (
    ANALYZE_TOKS_SQL,
    analyze_tokens,
)

DIRTY = [
    ("Hello, World!", ["hello", "world"]),
    ("  Spark--JOIN  window.  ", ["spark", "join", "window"]),
    ("", []),
    ("!!!...---", []),
    ("CamelCase and123 mixed_case", ["camelcase", "and123", "mixed", "case"]),
    ("a  b\tc\nd", ["a", "b", "c", "d"]),
    ("ALL CAPS", ["all", "caps"]),
]


def test_analyze_tokens_semantics(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(DIRTY)],
                               "i long, text string")
    got = {r.i: r.toks for r in
           df.select("i", analyze_tokens(F.col("text")).alias("toks")).collect()}
    for i, (_, want) in enumerate(DIRTY):
        assert got[i] == want, f"{DIRTY[i][0]!r} -> {got[i]}"


def test_analyze_sql_twin_matches(spark):
    con = duckdb.connect()
    for s, want in DIRTY:
        lit = "'" + s.replace("'", "''") + "'"
        got = con.execute(
            "SELECT " + ANALYZE_TOKS_SQL.replace("text", lit)).fetchone()[0]
        assert list(got) == want, f"{s!r} -> {got}"
    con.close()


@pytest.fixture()
def dirty_sf_dir(spark, tmp_path):
    """A miniature sf-dir whose documents.parquet is deliberately dirty:
    casing, punctuation, tabs, runs of separators — plus the fixed query
    terms the search operators target."""
    rows = [
        (0, "Spark JOIN window; spark (join) WINDOW data Window!", "en", "web", 50),
        (1, "the data window... slows, Slow SLOW? join", "en", "web", 40),
        (2, "spark-join-window data window", "de", "wiki", 29),
        (3, "Nothing relevant here, truly.", "en", "wiki", 28),
        (4, "sort/scan & merge: spark? spark!! join", "fr", "web", 37),
        (5, "window data   spark\tjoin data window", "en", "news", 36),
        (6, "", "en", "news", 0),
        (7, "!!!", "de", "news", 3),
        (8, "spa data window rk JOIN spark", "en", "web", 29),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Order-insensitive value compare against DuckDB on the dirty corpus
    (documents view only — the shared harness wants every fixture table)."""
    con = duckdb.connect()
    # Spark writes the table as a directory of part files.
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    du = con.execute(oracle_sql).df()
    con.close()
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(du.columns)
    cols = sorted(sp.columns)

    def canon(df):
        out = []
        for t in df[cols].itertuples(index=False):
            out.append(tuple(
                round(v, 6) if isinstance(v, float) else v for v in t))
        return Counter(out)

    assert canon(sp) == canon(du)


SEARCH_QUERIES = (
    "q_inverted_index", "q_bm25", "q_boolean_search", "q_phrase_match",
    "q_significant_terms", "q_highlight", "q_search_facets", "q_suggest",
    "q_fuzzy_search", "q_wildcard_search", "q_dis_max",
)


def test_search_surface_parity_on_dirty_corpus(spark, dirty_sf_dir):
    """Every analyzer-consuming search query must match its oracle on text
    the fixtures never exercise: mixed case, punctuation runs, tabs,
    empty/punctuation-only documents."""
    from elasticsearch_hbase_river_spark.registry import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    for name in SEARCH_QUERIES:
        _compare(queries[name](spark, dirty_sf_dir), oracles[name],
                 dirty_sf_dir)


def test_indexed_search_analyzes_identically(spark, dirty_sf_dir, tmp_path, monkeypatch):
    """The materialized index build must run the SAME analyzer as the
    per-query rebuild: the indexed BM25 over the dirty corpus has to be
    row-identical to q_bm25 (and to the shared oracle)."""
    monkeypatch.setenv("RIVER_INDEX_ROOT", str(tmp_path / "idx_root"))
    from elasticsearch_hbase_river_spark.operators import indexed_search as ix
    from elasticsearch_hbase_river_spark.operators.search import ORACLES, q_bm25

    _compare(ix.q_bm25_indexed(spark, dirty_sf_dir), ORACLES["q_bm25"],
             dirty_sf_dir)
    a = sorted(map(tuple, q_bm25(spark, dirty_sf_dir).collect()))
    b = sorted(map(tuple, ix.q_bm25_indexed(spark, dirty_sf_dir).collect()))
    assert a == b
    # index-native derived queries carry analyzer-aware oracles of their own
    for name in ("q_tfidf_indexed", "q_unigram_logprob_indexed",
                 "q_index_stats", "q_term_vectors"):
        _compare(ix.QUERIES[name](spark, dirty_sf_dir), ix.ORACLES[name],
                 dirty_sf_dir)


def test_ascii_guard_rejects_non_ascii_corpus(spark):
    """The analyzer's [a-z0-9] scope is enforced at index build: a corpus
    with non-ASCII letters must fail loudly (it would silently
    mis-tokenize, and the oracles mirror the same approximation, so the
    correctness gate cannot catch it)."""
    from elasticsearch_hbase_river_spark.functions.analyzer import (
        assert_ascii_corpus,
    )

    ok = spark.createDataFrame([("plain ascii text 123",)], "text string")
    assert_ascii_corpus(ok)  # no raise
    bad = spark.createDataFrame(
        [("clean line",), ("café au lait",)], "text string")
    with pytest.raises(ValueError, match="non-ASCII"):
        assert_ascii_corpus(bad)


def test_index_build_runs_ascii_guard(spark, tmp_path):
    """build_index refuses a non-ASCII corpus outright."""
    from elasticsearch_hbase_river_spark.operators.indexed_search import (
        build_index,
    )

    docs = spark.createDataFrame(
        [(1, "ein schönes Dokument")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-ASCII"):
        build_index(spark, docs, str(tmp_path / "idx"))


# ---------------------------------------------------------------------------
# Unicode analyzer mode (round 8): multilingual chain + guard + index build.

UNI_DIRTY = [
    ("Grüße aus MÜNCHEN! Café №42 — données déjà vu",
     ["grüße", "aus", "münchen", "café", "42", "données", "déjà", "vu"]),
    # capital FINAL sigma: the ς→σ fold must unify the cased forms
    ("ΟΔΥΣΣΕΥΣ και οδυσσευς", ["οδυσσευσ", "και", "οδυσσευσ"]),
    ("Привет, МИР!", ["привет", "мир"]),
    ("東京タワー 123 ١٢٣", ["東京タワー", "123", "١٢٣"]),
    ("", []),
    ("!!! … ***", []),
    # decomposed accent (e + combining acute) stays inside its token
    ("naïve étude", ["naïve", "étude"]),
    ("plain ascii stays identical 42", ["plain", "ascii", "stays",
                                        "identical", "42"]),
]


def test_analyze_tokens_unicode_semantics(spark):
    from elasticsearch_hbase_river_spark.functions.analyzer import (
        analyze_tokens_unicode,
    )

    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(UNI_DIRTY)],
                               "i long, text string")
    got = {r.i: r.toks for r in
           df.select("i", analyze_tokens_unicode(F.col("text"))
                     .alias("toks")).collect()}
    for i, (_, want) in enumerate(UNI_DIRTY):
        assert got[i] == want, f"{UNI_DIRTY[i][0]!r} -> {got[i]}"


def test_analyze_unicode_sql_twin_matches(spark):
    from elasticsearch_hbase_river_spark.functions.analyzer import (
        analyze_toks_unicode_sql,
    )

    con = duckdb.connect()
    for s, want in UNI_DIRTY:
        got = con.execute("SELECT " + analyze_toks_unicode_sql("?"),
                          [s]).fetchone()[0]
        assert list(got) == want, f"{s!r} -> {got}"
    con.close()


def test_unicode_guard_scope(spark):
    """unicode mode accepts real multilingual text; it refuses only the
    frozen engine-divergent codepoints (Unicode-14+ additions, U+0130)."""
    from elasticsearch_hbase_river_spark.functions.analyzer import (
        assert_analyzable_corpus,
    )

    ok = spark.createDataFrame(
        [(s,) for s, _ in UNI_DIRTY if s], "text string")
    assert_analyzable_corpus(ok, mode="unicode")  # no raise

    for bad_text in ("İstanbul",            # U+0130: full-casemap divergence
                     "ab\U00010570cd",      # Vithkuqi: Unicode 14 addition
                     "x᫁y"):           # Unicode 14 combining mark
        bad = spark.createDataFrame([("clean",), (bad_text,)], "text string")
        with pytest.raises(ValueError, match="Unicode"):
            assert_analyzable_corpus(bad, mode="unicode")

    with pytest.raises(ValueError, match="mode"):
        assert_analyzable_corpus(ok, mode="latin1")


def test_index_build_unicode_mode_end_to_end(spark, tmp_path):
    """build_index(mode='unicode') over a multilingual corpus: postings are
    unicode-analyzed (bucket pruning included — driver-side xxh64 must
    agree with Spark's on non-ASCII terms), BM25 serves accented terms,
    and the sigma fold makes cased Greek forms one term."""
    from elasticsearch_hbase_river_spark.operators.indexed_search import (
        bm25_from_index,
        build_index,
        read_postings,
    )

    docs = spark.createDataFrame(
        [(1, "Grüße données Grüße ΟΔΥΣΣΕΥΣ"),
         (2, "données et café"),
         (3, "οδυσσευς im café München"),
         (4, "plain ascii filler text")],
        "doc_id long, text string")
    idx = str(tmp_path / "uni_idx")
    build_index(spark, docs, idx, mode="unicode")

    got = {(r.token, r.doc_id): r.tf
           for r in read_postings(
               spark, idx, terms=("grüße", "οδυσσευσ")).collect()}
    assert got == {("grüße", 1): 2, ("οδυσσευσ", 1): 1, ("οδυσσευσ", 3): 1}

    top = bm25_from_index(spark, idx, terms=("grüße", "données"), top=4)
    rows = top.collect()
    assert [r.doc_id for r in rows][0] == 1      # both terms, tf 2 + 1
    assert {r.doc_id for r in rows} == {1, 2}    # doc 3/4 match neither

    # ascii mode still refuses this corpus outright
    with pytest.raises(ValueError, match="non-ASCII"):
        build_index(spark, docs, str(tmp_path / "ascii_idx"), mode="ascii")


def test_index_stream_unicode_mode(spark, tmp_path):
    """The streaming index maintainer honors the analyzer mode: a
    multilingual docs feed builds unicode-analyzed epochs (and would be
    refused outright in the default ascii mode)."""
    from elasticsearch_hbase_river_spark.streaming.river_stream import (
        read_inverted_index,
        start_index_stream,
    )

    src = str(tmp_path / "uni_src")
    spark.createDataFrame(
        [(1, "Grüße ΟΔΥΣΣΕΥΣ données", None),
         (2, "données et café", None)],
        "doc_id long, text string, ver long") \
        .write.mode("append").parquet(src)

    idx = str(tmp_path / "uni_epochs")
    q = start_index_stream(spark, src, idx, str(tmp_path / "uni_ckpt"),
                           mode="unicode")
    assert q.awaitTermination(120), "stream did not drain in 120s"
    toks = {r.token for r in
            read_inverted_index(spark, idx).select("token").collect()}
    assert {"grüße", "οδυσσευσ", "données", "café"} <= toks

    # ascii mode refuses the same feed (guard runs inside the batch)
    q2 = start_index_stream(spark, src, str(tmp_path / "ascii_epochs"),
                            str(tmp_path / "ascii_ckpt"), mode="ascii")
    import pytest as _pytest

    with _pytest.raises(Exception, match="non-ASCII"):
        q2.awaitTermination(120)
        q2.processAllAvailable()


def test_unicode_fold_parity_turkish_arabic(spark):
    """Stemming-free fold parity for the two classic trouble spots (round-9
    VERDICT item 5): Turkish dotless-ı and Arabic tatweel (kashida).

    Contract (documented in functions/analyzer.py): unicode mode folds
    with the ROOT-locale simple mapping both engines share — 'I' → 'i'
    (never 'ı': Turkish-locale casing is exactly the full-casemap
    divergence class the guard exists for, and its marker codepoint
    U+0130 İ is refused), dotless ı is lower-stable, and tatweel (U+0640,
    category Lm → \\p{L}) stays INSIDE its token in both engines, so
    elongated Arabic spellings tokenize identically — deduplication /
    search treats 'اﻟـــكتاب'-style kashida stretching as its own token
    string, NOT as a separator split."""
    from elasticsearch_hbase_river_spark.functions.analyzer import (
        analyze_tokens_unicode,
        analyze_toks_unicode_sql,
        assert_analyzable_corpus,
    )

    cases = [
        ("ılık IRMAK", ["ılık", "irmak"]),      # ı stable; I → i (root)
        ("ışık ışık", ["ışık", "ışık"]),        # lower-stable fixpoint
        ("الـــكتاب كتاب", ["الـــكتاب", "كتاب"]),  # tatweel stays in-token
        ("ـ", ["ـ"]),                            # bare tatweel is a token
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)],
                               "i long, text string")
    assert_analyzable_corpus(df, mode="unicode")  # guard admits all four
    got = {r.i: r.toks for r in
           df.select("i", analyze_tokens_unicode(F.col("text"))
                     .alias("toks")).collect()}
    con = duckdb.connect()
    for i, (s, want) in enumerate(cases):
        assert got[i] == want, f"{s!r} -> {got[i]}"
        duck = con.execute("SELECT " + analyze_toks_unicode_sql("?"),
                           [s]).fetchone()[0]
        assert list(duck) == want, f"duckdb {s!r} -> {duck}"
    con.close()
