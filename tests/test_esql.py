"""ES|QL parser + compiler semantics (`elasticsearch_hbase_river_spark/esql.py`).

Oracle parity of the registered pack rides on `test_oracle_parity` like every
other pack; these tests pin the language features the oracle can't see —
parse errors with positions, precedence, null-ordering contract, ROW,
KEEP/DROP wildcards, GROK/DISSECT capture semantics, lookup-join conflict
resolution — plus the plan shapes the compiler must emit (broadcast lookup,
pushdown through the pipe).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.esql import (
    ESQLError,
    EnrichPolicy,
    _compile_dissect,
    _compile_grok,
    esql,
    parse,
)


# ---------------------------------------------------------------------------
# parser


def test_parse_command_chain():
    cmds = parse('FROM events | WHERE value > 1 | STATS n = COUNT(*) '
                 'BY event_type | SORT n DESC | LIMIT 5')
    assert [c["cmd"] for c in cmds] == [
        "FROM", "WHERE", "STATS", "SORT", "LIMIT"]
    assert cmds[0]["table"] == "events"
    assert cmds[4]["n"] == 5


def test_parse_precedence_and_not():
    (w,) = [c for c in parse(
        'FROM events | WHERE NOT a LIKE "x*" AND b == 1 OR c == 2')
        if c["cmd"] == "WHERE"]
    # OR is outermost, AND binds tighter, NOT applies to the LIKE only
    e = w["expr"]
    assert e[0] == "bin" and e[1] == "or"
    left = e[2]
    assert left[0] == "bin" and left[1] == "and"
    assert left[2][0] == "not" and left[2][1][0] == "like"


def test_parse_not_in():
    (w,) = [c for c in parse('FROM events | WHERE x NOT IN (1, 2)')
            if c["cmd"] == "WHERE"]
    assert w["expr"][0] == "not" and w["expr"][1][0] == "in"


@pytest.mark.parametrize("bad,msg", [
    ('SELECT * FROM x', "must start with FROM, TS, ROW or SHOW"),
    ('FROM events | FROBNICATE x', "unknown command"),
    ('FROM events | WHERE "unterminated', "unterminated string"),
    ('FROM events | LIMIT "ten"', "integer literal"),
    ('FROM events extra', "trailing input"),
    ('FROM a METADATA _id', "METADATA _index"),
])
def test_parse_errors(bad, msg):
    with pytest.raises(ESQLError, match=msg):
        # compile errors (unknown function) need the compiler to walk it
        cmds_or_df = parse(bad)
        del cmds_or_df


def test_error_carries_position():
    with pytest.raises(ESQLError, match=r"line 1, col"):
        parse('FROM events | LIMIT x')


# ---------------------------------------------------------------------------
# dissect / grok pattern compilers


def test_dissect_regex():
    regex, keys = _compile_dissect("%{a}-%{b}")
    assert regex == "^(.*?)\\-(.*)$" or regex == "^(.*?)-(.*)$"
    assert [k for k, _, _ in keys] == ["a", "b"]


def test_dissect_skip_key():
    regex, keys = _compile_dissect("%{a} %{} %{c}")
    assert [k for k, _, _ in keys] == ["a", "c"]
    assert "(.*?)" in regex


def test_grok_typed_and_unnamed():
    regex, keys = _compile_grok("%{WORD} id=%{INT:ident:int}")
    assert keys == [("ident", "long", False)]
    assert "(?:" in regex  # unnamed pattern is non-capturing


def test_grok_log_patterns(spark):
    row = esql(spark, (
        'ROW line = "2024-03-01T12:30:05Z ERROR 10.0.0.7 worker died" '
        '| GROK line "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} '
        '%{IP:ip} %{GREEDYDATA:msg}"')).first()
    assert row.ts == "2024-03-01T12:30:05Z"
    assert row.lvl == "ERROR" and row.ip == "10.0.0.7"
    assert row.msg == "worker died"


def test_grok_unknown_pattern():
    with pytest.raises(ESQLError, match="unsupported GROK pattern"):
        _compile_grok("%{NOPE:x}")


# ---------------------------------------------------------------------------
# property tests (pure Python — no Spark per example)


def _regex_of(pat: str, wild: str, one: str, escapable: str) -> str:
    """Reference LIKE-dialect matcher: translate to a Python regex."""
    import re as _re
    out, i = [], 0
    while i < len(pat):
        c = pat[i]
        if c == "\\" and i + 1 < len(pat) and pat[i + 1] in escapable:
            out.append(_re.escape(pat[i + 1]))
            i += 2
            continue
        if c == wild:
            out.append(".*")
        elif c == one:
            out.append(".")
        else:
            out.append(_re.escape(c))
        i += 1
    return "".join(out)


def test_like_translation_equivalence_property():
    """For every pattern over the wildcard/escape alphabet, the SQL LIKE
    produced by _like_to_sql accepts exactly the strings ES|QL LIKE
    accepts (both sides modeled as regexes with their own dialect)."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from elasticsearch_hbase_river_spark.esql import _like_to_sql

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="ab*?\\%_", max_size=8),
           st.text(alphabet="ab*?%_\\", max_size=8))
    def check(pat, s):
        esql_re = _regex_of(pat, "*", "?", "*?\\")
        sql_re = _regex_of(_like_to_sql(pat), "%", "_",
                           "%_\\" + "*?")  # SQL escape applies to any char
        assert (_re.fullmatch(sql_re, s) is not None) == \
               (_re.fullmatch(esql_re, s) is not None), (
            pat, _like_to_sql(pat), s)

    check()


def test_parser_totality_property():
    """The parser is TOTAL over arbitrary input: it either parses or
    raises ESQLError with a position — never IndexError/KeyError/etc."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet='abc01 ()|=<>!+-*/%,."\\`', max_size=40))
    def check(s):
        for prefix in ("FROM t | WHERE ", "FROM t | ", ""):
            try:
                parse(prefix + s)
            except ESQLError:
                pass

    check()


# ---------------------------------------------------------------------------
# compiler semantics (tiny ROW-driven checks — no fixture I/O)


def test_row_and_eval(spark):
    df = esql(spark, 'ROW a = 2, b = "xy" | EVAL c = a * 3 + 1, '
                     'd = CONCAT(b, TO_STRING(a))')
    row = df.first()
    assert row.c == 7 and row.d == "xy2"


def test_case_like_in(spark):
    df = esql(spark, 'ROW s = "hello_world", n = 5 '
                     '| EVAL t = CASE(n > 3, "big", "small"), '
                     '  m = CASE(n > 9, "big")'
                     '| WHERE s LIKE "hello*" AND n IN (4, 5)')
    row = df.first()
    assert row.t == "big" and row.m is None


def test_like_escapes_sql_metachars(spark):
    # a literal '%' in the data must not act as a wildcard
    df = esql(spark, 'ROW s = "100%" | WHERE s LIKE "100*"')
    assert df.count() == 1
    df2 = esql(spark, 'ROW s = "100x" | WHERE s LIKE "100%"')
    assert df2.count() == 0  # '%' is literal in ES|QL LIKE


def test_rlike_whole_string(spark):
    assert esql(spark, 'ROW s = "abc" | WHERE s RLIKE "ab"').count() == 0
    assert esql(spark, 'ROW s = "abc" | WHERE s RLIKE "ab."').count() == 1


def test_rlike_top_level_alternation_stays_anchored(spark):
    # "view|click" must NOT match "viewer" (^view|click$ would)
    assert esql(spark, 'ROW s = "viewer" '
                       '| WHERE s RLIKE "view|click"').count() == 0
    assert esql(spark, 'ROW s = "click" '
                       '| WHERE s RLIKE "view|click"').count() == 1


def test_rlike_regex_escapes_survive_lexer(spark):
    assert esql(spark, 'ROW s = "123" | WHERE s RLIKE "\\d+"').count() == 1
    assert esql(spark, 'ROW s = "abc" | WHERE s RLIKE "\\d+"').count() == 0


def test_like_escaped_wildcard_is_literal(spark):
    # \* matches only a literal asterisk
    assert esql(spark, 'ROW s = "100*" | WHERE s LIKE "100\\*"').count() == 1
    assert esql(spark, 'ROW s = "100x" | WHERE s LIKE "100\\*"').count() == 0


def test_truncated_stats_is_esql_error(spark):
    with pytest.raises(ESQLError, match="expected expression"):
        parse("FROM t | STATS")
    with pytest.raises(ESQLError, match="expected expression"):
        parse("FROM t | STATS n = COUNT(*) BY")


def test_sort_null_contract(spark, tmp_path):
    # ES|QL: null is LARGER than any value — last under ASC, first under DESC
    src = str(tmp_path / "nulls")
    spark.createDataFrame([(1,), (None,), (3,)], "v int") \
        .write.parquet(src)
    t = {"t": spark.read.parquet(src)}
    asc = [r.v for r in esql(spark, "FROM t | SORT v", tables=t).collect()]
    desc = [r.v for r in esql(spark, "FROM t | SORT v DESC",
                              tables=t).collect()]
    override = [r.v for r in esql(spark, "FROM t | SORT v NULLS FIRST",
                                  tables=t).collect()]
    assert asc == [1, 3, None]
    assert desc == [None, 3, 1]
    assert override == [None, 1, 3]


def test_keep_drop_wildcards(spark, sf_dir):
    df = esql(spark, "FROM lineitem | KEEP l_order*, l_quantity", sf_dir)
    assert df.columns == ["l_orderkey", "l_quantity"]
    df2 = esql(spark, "FROM lineitem | DROP l_order*, l_ship*", sf_dir)
    assert "l_orderkey" not in df2.columns
    assert "l_quantity" in df2.columns


def test_unknown_function_compile_error(spark):
    with pytest.raises(ESQLError, match="unknown function"):
        esql(spark, "ROW a = 1 | EVAL b = NOFN(a)")


def test_drop_everything_refused(spark, sf_dir):
    with pytest.raises(ESQLError, match="every column"):
        esql(spark, "FROM lineitem | DROP l_*", sf_dir)


def test_keep_no_match_refused(spark, sf_dir):
    with pytest.raises(ESQLError, match="matches no column"):
        esql(spark, "FROM lineitem | KEEP nope_*", sf_dir)


def test_unknown_column_names_have(spark):
    with pytest.raises(ESQLError, match="unknown column"):
        esql(spark, "ROW a = 1 | WHERE b == 2")


def test_agg_outside_stats_refused(spark):
    with pytest.raises(ESQLError, match="only valid inside STATS"):
        esql(spark, "ROW a = 1 | EVAL b = SUM(a)")


def test_stats_without_agg_refused(spark):
    with pytest.raises(ESQLError, match="contains no aggregate"):
        esql(spark, "ROW a = 1 | STATS b = ROUND(a, 2)")


def test_computed_by_needs_name(spark):
    with pytest.raises(ESQLError, match="explicit"):
        esql(spark, "ROW a = 1 | STATS n = COUNT(*) BY TO_STRING(a)")


def test_mv_expand_null_row_kept(spark):
    df = esql(spark, 'ROW s = "a b", t = "solo" '
                     '| EVAL parts = SPLIT(s, " ") | MV_EXPAND parts')
    assert df.count() == 2
    # null multivalue stays as one null row (explode_outer semantics)
    df2 = esql(spark, 'ROW s = "x" | EVAL parts = SPLIT(TO_STRING(NULL), " ")'
                      ' | MV_EXPAND parts')
    assert df2.count() == 1 and df2.first().parts is None


def test_lookup_join_conflict_lookup_wins(spark, tmp_path):
    left = spark.createDataFrame([(1, "stale"), (2, "stale")], "k int, v string")
    right = spark.createDataFrame([(1, "fresh")], "k int, v string")
    df = esql(spark, "FROM l | LOOKUP JOIN r ON k | SORT k",
              tables={"l": left, "r": right})
    rows = df.collect()
    assert [r.v for r in rows] == ["fresh", None]  # lookup side wins


def test_enrich_unknown_policy_and_field(spark, sf_dir):
    with pytest.raises(ESQLError, match="unknown enrich policy"):
        esql(spark, "FROM customer | ENRICH nope ON c_nationkey", sf_dir)
    with pytest.raises(ESQLError, match="not in policy"):
        esql(spark, "FROM customer | ENRICH nations ON c_nationkey "
                    "WITH n_comment", sf_dir)


def test_enrich_custom_policy(spark):
    dim = spark.createDataFrame([(10, "x")], "dk int, dval string")
    fact = spark.createDataFrame([(10,), (11,)], "fk int")
    df = esql(spark, "FROM f | ENRICH d ON fk | SORT fk",
              tables={"f": fact, "d": dim},
              policies={"d": EnrichPolicy("d", "dk", ("dval",))})
    assert [r.dval for r in df.collect()] == ["x", None]


def test_stats_per_agg_where(spark, tmp_path):
    src = str(tmp_path / "sw")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "g string, v double") \
        .write.parquet(src)
    t = {"t": spark.read.parquet(src)}
    row = esql(spark, 'FROM t | STATS na = COUNT(*) WHERE g == "a", '
                      'sa = SUM(v) WHERE g == "a", '
                      'sz = SUM(v) WHERE g == "zzz", '
                      'n = COUNT(*)', tables=t).first()
    assert row.na == 2 and row.sa == 3.0 and row.n == 3
    assert row.sz is None  # empty filtered SUM is null, count would be 0


def test_stats_per_agg_where_under_operators(spark, tmp_path):
    # the filter must survive arithmetic/boolean wrappers around the
    # aggregate, not just scalar-function wrappers (round-8 ADVICE)
    src = str(tmp_path / "swo")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "g string, v double") \
        .write.parquet(src)
    t = {"t": spark.read.parquet(src)}
    row = esql(spark, 'FROM t | STATS '
                      'm = SUM(v) / COUNT(*) WHERE g == "a", '
                      'neg = - SUM(v) WHERE g == "a", '
                      'plus = SUM(v) + COUNT(*) WHERE g == "b"',
               tables=t).first()
    assert row.m == 1.5       # 3.0 / 2, not 13.0 / 3
    assert row.neg == -3.0
    assert row.plus == 11.0   # 10.0 + 1


def test_mv_slice_negative_bounds(spark):
    row = esql(spark, (
        'ROW xs = "x y z" | EVAL arr = SPLIT(xs, " "), '
        '  tail2 = MV_SLICE(arr, -2, -1), '
        '  clamped = MV_SLICE(arr, -5, -1), '
        '  last = MV_SLICE(arr, -1, -1)')).first()
    assert row.tail2 == ["y", "z"]
    assert row.clamped == ["x", "y", "z"]  # start clamps to the head
    assert row.last == ["z"]


def test_sample_deterministic_and_validated(spark):
    t = spark.range(500).selectExpr("id")
    n1 = esql(spark, "FROM t | SAMPLE 0.3 | STATS n = COUNT(*)",
              tables={"t": t}).first().n
    n2 = esql(spark, "FROM t | SAMPLE 0.3 | STATS n = COUNT(*)",
              tables={"t": t}).first().n
    assert n1 == n2 and 0 < n1 < 500  # content-hash coin: reproducible
    with pytest.raises(ESQLError, match="probability"):
        esql(spark, "FROM t | SAMPLE 1.5", tables={"t": t})
    with pytest.raises(ESQLError, match="probability"):
        esql(spark, "FROM t | SAMPLE 0", tables={"t": t})


def test_lookup_join_multi_key(spark):
    left = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 20.0), ("a", 2, 30.0)],
        "k1 string, k2 int, v double")
    dim = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y")], "k1 string, k2 int, tag string")
    rows = esql(spark, "FROM l | LOOKUP JOIN d ON k1, k2 | SORT k1, k2",
                tables={"l": left, "d": dim}).collect()
    assert [(r.k1, r.k2, r.tag) for r in rows] == [
        ("a", 1, "x"), ("a", 2, "y"), ("b", 2, None)]


def test_dissect_append_modifier(spark):
    row = esql(spark, 'ROW line = "2024-01-02 03:04:05 host1" | DISSECT '
                      'line "%{date} %{+date} %{host}" '
                      'APPEND_SEPARATOR="T"').first()
    assert row.date == "2024-01-02T03:04:05" and row.host == "host1"
    # default separator is empty (the ES default)
    row2 = esql(spark, 'ROW s = "ab cd" | DISSECT s "%{x} %{+x}"').first()
    assert row2.x == "abcd"


def test_dissect_repeated_key_without_append_refused(spark):
    with pytest.raises(ESQLError, match="append"):
        esql(spark, 'ROW s = "a b" | DISSECT s "%{x} %{x}"')


def test_mv_function_family(spark):
    row = esql(spark, (
        'ROW s = "3 1 2" | EVAL arr = SPLIT(s, " "), '
        '  sm = MV_SUM(arr), av = MV_AVG(arr), md = MV_MEDIAN(arr), '
        '  f = MV_FIRST(arr), l = MV_LAST(arr), '
        '  c = MV_CONCAT(arr, "-"), ap = MV_COUNT(MV_APPEND(arr, arr)), '
        '  z = MV_ZIP(arr, arr, ":")')).first()
    assert row.sm == 6.0 and row.av == 2.0 and row.md == 2.0
    assert row.f == "3" and row.l == "2" and row.c == "3-1-2"
    assert row.ap == 6 and row.z == ["3:3", "1:1", "2:2"]
    # even-count median is the mean of the two middle values
    row2 = esql(spark,
                'ROW s = "4 1 3 2" | EVAL md = MV_MEDIAN(SPLIT(s, " "))'
                ).first()
    assert row2.md == 2.5


def test_mv_zip_uneven_tail_passes_through(spark):
    row = esql(spark, 'ROW a = "x y z", b = "1" | EVAL z = '
                      'MV_ZIP(SPLIT(a, " "), SPLIT(b, " "), "-")').first()
    assert row.z == ["x-1", "y", "z"]


def test_to_ip_and_ip_prefix(spark):
    row = esql(spark, (
        'ROW good = "10.1.2.3", bad = "10.1.2.300", zeros = "1.2.3.01" '
        '| EVAL g = TO_IP(good), b = TO_IP(bad), z = TO_IP(zeros), '
        '  p24 = IP_PREFIX(good, 24, 128), p16 = IP_PREFIX(good, 16, 128), '
        '  p32 = IP_PREFIX(good, 32, 128), p0 = IP_PREFIX(good, 0, 128)'
    )).first()
    assert row.g == "10.1.2.3" and row.b is None and row.z is None
    assert row.p24 == "10.1.2.0" and row.p16 == "10.1.0.0"
    assert row.p32 == "10.1.2.3" and row.p0 == "0.0.0.0"
    with pytest.raises(ESQLError, match="prefix length"):
        esql(spark, 'ROW ip = "1.2.3.4" | EVAL p = IP_PREFIX(ip, 33, 128)')


def test_mv_slice_mixed_sign_refused(spark):
    with pytest.raises(ESQLError, match="both negative"):
        esql(spark, 'ROW a = "x y" | EVAL s = '
                    'MV_SLICE(SPLIT(a, " "), -2, 1)')
    with pytest.raises(ESQLError, match=">= start"):
        esql(spark, 'ROW a = "x y" | EVAL s = '
                    'MV_SLICE(SPLIT(a, " "), 2, 1)')


def test_inlinestats_joins_back(spark):
    df = esql(spark, 'ROW g = "a" | INLINESTATS n = COUNT(*)')
    row = df.first()
    assert row.n == 1 and row.g == "a"  # agg value lands on the row


def test_inlinestats_grouped(spark, tmp_path):
    src = str(tmp_path / "g")
    spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "g string, v double") \
        .write.parquet(src)
    t = {"t": spark.read.parquet(src)}
    rows = esql(spark, "FROM t | INLINESTATS m = AVG(v) BY g "
                       "| WHERE v > m", tables=t).collect()
    assert [(r.g, r.v) for r in rows] == [("a", 3.0)]


def test_inlinestats_computed_key_materializes(spark):
    # computed BY keys are EVAL'd onto the rows first (ES keeps the
    # computed key column); unnamed computed keys still refuse
    row = esql(spark, 'ROW a = 1 | INLINESTATS n = COUNT(*) '
                      'BY k = TO_STRING(a)').collect()[0]
    assert row.k == "1" and row.n == 1


def test_scalar_function_breadth(spark):
    row = esql(spark, (
        'ROW s = "abcabc", xs = "c b a c" '
        '| EVAL arr = SPLIT(xs, " "), '
        '  dd = MV_DEDUPE(arr), srt = MV_SORT(arr), '
        '  sl = MV_SLICE(arr, 1, 2), '
        '  rev = REVERSE(s), rep = REPEAT(s, 2), '
        '  loc = LOCATE(s, "ca"), sg = SIGNUM(0 - 7), '
        '  lg = ROUND(LOG(2, 8), 6), '
        '  dd_h = DATE_DIFF("hour", TO_DATETIME("2020-01-01"), '
        '                   TO_DATETIME("2020-01-02"))')).first()
    assert row.dd == ["a", "b", "c"]
    assert row.srt == ["a", "b", "c", "c"]
    assert row.sl == ["b", "a"]
    assert row.rev == "cbacba" and row.rep == "abcabcabcabc"
    assert row.loc == 3 and row.sg == -1.0
    assert row.lg == 3.0 and row.dd_h == 24


def test_hash_cidr_dateformat(spark):
    row = esql(spark, (
        'ROW ip = "10.1.2.3", s = "abc" '
        '| EVAL in10 = CIDR_MATCH(ip, "10.0.0.0/8"), '
        '  in192 = CIDR_MATCH(ip, "192.168.0.0/16", "172.16.0.0/12"), '
        '  h = HASH("md5", s), '
        '  d = DATE_FORMAT("yyyy-MM", TO_DATETIME("2021-07-04")), '
        '  p = DATE_PARSE("yyyy/MM/dd", "2021/07/04")')).first()
    assert row.in10 is True and row.in192 is False
    assert row.h == "900150983cd24fb0d6963f7d28e17f72"
    assert row.d == "2021-07"
    assert str(row.p).startswith("2021-07-04")


def test_hash_unknown_alg(spark):
    with pytest.raises(ESQLError, match="unsupported HASH"):
        esql(spark, 'ROW s = "x" | EVAL h = HASH("crc32", s)')


def test_cidr_bad_block(spark):
    with pytest.raises(ESQLError, match="bad CIDR block"):
        esql(spark, 'ROW ip = "1.2.3.4" | EVAL m = CIDR_MATCH(ip, "300.0.0.0/8")')


def test_match_or_semantics(spark):
    # OR operator: any analyzed query term present ⇒ true; analyzer
    # lowercases and strips punctuation on both sides
    df = esql(spark, 'ROW t = "Big Spark Engine!" '
                     '| WHERE MATCH(t, "spark window")')
    assert df.count() == 1
    df2 = esql(spark, 'ROW t = "no hits here" '
                      '| WHERE MATCH(t, "spark window")')
    assert df2.count() == 0


def test_date_trunc_span_and_string(spark, sf_dir):
    a = esql(spark, "FROM events | EVAL d = DATE_TRUNC(1 day, ts) "
                    "| STATS n = COUNT(*) BY d | SORT d", sf_dir)
    b = esql(spark, 'FROM events | EVAL d = DATE_TRUNC("day", ts) '
                    "| STATS n = COUNT(*) BY d | SORT d", sf_dir)
    assert a.collect() == b.collect()


def test_date_trunc_unknown_multi_unit_refused(spark, sf_dir):
    # uniform and calendar multi-unit spans are supported (grid-floor /
    # month arithmetic); anything else is a positioned error
    with pytest.raises(ESQLError, match="uniform or calendar"):
        esql(spark, "FROM events | EVAL d = DATE_TRUNC(7 millisecond, ts)",
             sf_dir)


def test_span_outside_date_trunc_refused(spark):
    with pytest.raises(ESQLError, match="only valid inside"):
        esql(spark, "ROW a = 1 | EVAL b = 1 day")


def test_fork_union_by_name(spark):
    df = esql(spark, 'ROW a = 1 | FORK ( EVAL b = a + 1 ) ( EVAL c = a * 10 )')
    rows = sorted(df.collect(), key=lambda r: r._fork)
    assert [r._fork for r in rows] == ["fork1", "fork2"]
    assert rows[0].b == 2 and rows[0].c is None     # null-padded
    assert rows[1].c == 10 and rows[1].b is None


def test_fork_single_branch_refused(spark):
    with pytest.raises(ESQLError, match="at least two"):
        parse('FROM t | FORK ( WHERE a == 1 )')


def test_esql_over_streaming_source(spark, sf_dir, tmp_path):
    """The compiler emits pure DataFrame transformations, so an ES|QL
    pipeline binds to a STREAMING relation unchanged (stateless commands +
    STATS as a streaming aggregation) — the river's trigger model applies
    to the query language for free."""
    from elasticsearch_hbase_river_spark.sources.tables import load_table

    text = ('FROM s | WHERE value > 50 '
            '| STATS n = COUNT(*), total = ROUND(SUM(value), 4) '
            'BY event_type')
    src = str(tmp_path / "esql_stream_src")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    ev.coalesce(2).write.parquet(src)

    sdf = (spark.readStream.schema(spark.read.parquet(src).schema)
           .parquet(src))
    q = (esql(spark, text, tables={"s": sdf})
         .writeStream.format("memory").queryName("esql_stream_sink")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "esql_ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in 120s"

    got = {(r.event_type, r.n, r.total)
           for r in spark.sql("SELECT * FROM esql_stream_sink").collect()}
    expect = {(r.event_type, r.n, r.total)
              for r in esql(spark, text,
                            tables={"s": spark.read.parquet(src)}).collect()}
    assert got == expect and got


def test_change_point_marks_argmax_row(spark, tmp_path):
    src = str(tmp_path / "cp")
    # flat at 10 for keys 1-4, steps to 100 at key 5 — ES CHANGE_POINT
    # reports the FIRST key of the new regime, i.e. k = 5
    spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 10.0), (4, 10.0),
         (5, 100.0), (6, 100.0), (7, 100.0)], "k int, v double") \
        .write.parquet(src)
    t = {"t": spark.read.parquet(src)}
    rows = esql(spark, "FROM t | CHANGE_POINT v ON k AS cp, pv | SORT k",
                tables=t).collect()
    marked = [r for r in rows if r.cp is not None]
    assert len(rows) == 7 and len(marked) == 1
    assert marked[0].k == 5 and marked[0].cp == "step_change"
    assert 0.0 <= marked[0].pv < 0.05  # a 10x step is significant


def test_change_point_flat_series_not_significant(spark, tmp_path):
    src = str(tmp_path / "cp_flat")
    spark.createDataFrame([(i, 5.0) for i in range(1, 6)],
                          "k int, v double").write.parquet(src)
    rows = esql(spark, "FROM t | CHANGE_POINT v ON k AS cp, pv | SORT k",
                tables={"t": spark.read.parquet(src)}).collect()
    marked = [r for r in rows if r.cp is not None]
    assert len(marked) == 1 and marked[0].pv == 1.0  # flat ⇒ p = 1, not 0


def test_change_point_duplicate_keys_refused(spark):
    df = esql(spark, 'ROW k = 1, v = 2.0 | FORK ( EVAL x = 1 ) '
                     '( EVAL x = 2 ) | CHANGE_POINT v ON k')
    with pytest.raises(Exception, match="unique key values"):
        df.collect()


def test_change_point_as_name_collisions_refused(spark):
    with pytest.raises(ESQLError, match="must be distinct"):
        esql(spark, "ROW k = 1, v = 2.0 | CHANGE_POINT v ON k AS k, pv")
    with pytest.raises(ESQLError, match="must be distinct"):
        esql(spark, "ROW k = 1, v = 2.0 | CHANGE_POINT v ON k AS a, a")


def test_cidr_match_invalid_ip_is_nonmatch(spark):
    # 1.2.3.400 folds to the same integer as 1.2.4.144 — must NOT match
    assert esql(spark, 'ROW ip = "1.2.3.400" '
                       '| WHERE CIDR_MATCH(ip, "1.2.4.144/32")').count() == 0
    assert esql(spark, 'ROW ip = "1.2" '
                       '| WHERE CIDR_MATCH(ip, "0.0.1.2/32")').count() == 0
    assert esql(spark, 'ROW ip = "1.2.4.144" '
                       '| WHERE CIDR_MATCH(ip, "1.2.4.144/32")').count() == 1


def test_cidr_bad_prefix_is_esql_error(spark):
    with pytest.raises(ESQLError, match="bad CIDR block"):
        esql(spark, 'ROW ip = "1.2.3.4" | EVAL m = CIDR_MATCH(ip, "10.0.0.0/x")')


def test_grok_flag_never_clobbers_user_column(spark):
    row = esql(spark, 'ROW __grok_matched = "keep", line = "a 1" '
                      '| GROK line "%{WORD:w} %{INT:i:int}"').first()
    assert row.asDict()["__grok_matched"] == "keep"
    assert row.w == "a" and row.i == 1


def test_cli_esql_runtime_error_exit_3(spark, capsys):
    from elasticsearch_hbase_river_spark.__main__ import main

    rc = main(["esql",
               'ROW s = "x" | EVAL p = DATE_PARSE("bad-Q-pattern", s)'])
    err = capsys.readouterr().err
    assert rc == 3 and "execution failed" in err


def test_cli_esql_subcommand(spark, sf_dir, capsys):
    from elasticsearch_hbase_river_spark.__main__ import main

    rc = main(["esql",
               "FROM events | STATS n = COUNT(*) BY event_type "
               "| SORT n DESC, event_type | LIMIT 3",
               "--data", sf_dir])
    out = capsys.readouterr().out
    assert rc == 0 and "event_type" in out and "n" in out

    rc2 = main(["esql", "FROM events | FROBNICATE x", "--data", sf_dir])
    err = capsys.readouterr().err
    assert rc2 == 2 and "unknown command" in err


# ---------------------------------------------------------------------------
# plan shapes — the compiler must emit the same physical plans the
# hand-written DataFrame twins would


def test_lookup_join_broadcasts(spark, sf_dir):
    from elasticsearch_hbase_river_spark.operators.esql_pack import QUERIES
    plan = QUERIES["q_esql_lookup"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_where_reaches_pushed_filters(spark, sf_dir):
    df = esql(spark, 'FROM lineitem '
                     '| WHERE l_quantity > 30 | KEEP l_orderkey, l_quantity',
              sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters")[1][:200]


def test_sort_limit_is_top_k(spark, sf_dir):
    from elasticsearch_hbase_river_spark.operators.esql_pack import QUERIES
    plan = QUERIES["q_esql_ship_topk"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_maxsim_is_top_k_not_global_sort(spark, sf_dir):
    from elasticsearch_hbase_river_spark.operators.esdsl10 import QUERIES
    plan = QUERIES["q_rank_vectors_maxsim"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# Round-9 tranche 2: multi-index FROM, range ENRICH, math/hash functions,
# STD_DEV / TOP aggregates.

def test_multi_index_from_union_by_name(spark, sf_dir):
    df = esql(spark, "FROM region, nation METADATA _index "
                     "| STATS n = COUNT(*) BY _index | SORT _index", sf_dir)
    rows = df.collect()
    assert [r._index for r in rows] == ["nation", "region"]
    assert [r.n for r in rows] == [25, 5]


def test_multi_index_null_padding(spark, sf_dir):
    df = esql(spark, "FROM region, nation METADATA _index "
                     "| WHERE _index == \"region\" | LIMIT 3", sf_dir)
    row = df.collect()[0]
    assert row.n_name is None and row.r_name is not None


def test_metadata_other_field_refused(spark):
    with pytest.raises(ESQLError, match="METADATA _index"):
        parse("FROM a METADATA _id")


def test_enrich_range_policy(spark, sf_dir):
    df = esql(spark, "ROW price = 149999.99 "
                     "| ENRICH price_tiers ON price WITH tier", sf_dir)
    assert df.collect()[0].tier == "medium"
    # half-open [lo, hi): the boundary belongs to the NEXT tier
    df = esql(spark, "ROW price = 150000.0 "
                     "| ENRICH price_tiers ON price WITH tier", sf_dir)
    assert df.collect()[0].tier == "large"


def test_math_function_family(spark):
    row = esql(spark, 'ROW x = 0.5 | EVAL s = ROUND(SIN(x), 6), '
               'c = ROUND(COS(x), 6), h = HYPOT(3.0, 4.0), cb = CBRT(27.0), '
               'd = TO_DEGREES(PI()), r = ROUND(TO_RADIANS(180.0), 6), '
               'a2 = ROUND(ATAN2(1.0, 1.0), 6), t = ROUND(TANH(0.0), 6)'
               ).collect()[0]
    import math
    assert row.h == 5.0 and row.cb == 3.0 and row.d == 180.0
    assert abs(row.s - math.sin(0.5)) < 1e-5
    assert abs(row.r - math.pi) < 1e-5 and row.a2 == 0.785398


def test_hash_and_encoding_functions(spark):
    row = esql(spark, 'ROW t = "abc" | EVAL m = MD5(t), s1 = SHA1(t), '
               's2 = SHA256(t), b = TO_BASE64(t), rt = FROM_BASE64(b), '
               'bl = BIT_LENGTH(t), ol = BYTE_LENGTH(t), sp = SPACE(2), '
               'tb = TO_BOOLEAN("TRUE"), fb = TO_BOOLEAN("nope")'
               ).collect()[0]
    import hashlib
    assert row.m == hashlib.md5(b"abc").hexdigest()
    assert row.s1 == hashlib.sha1(b"abc").hexdigest()
    assert row.s2 == hashlib.sha256(b"abc").hexdigest()
    assert row.rt == "abc" and row.bl == 24 and row.ol == 3
    assert row.sp == "  " and row.tb is True and row.fb is None


def test_top_aggregate_and_std_dev(spark, sf_dir):
    rows = esql(spark, 'FROM nation | STATS t2 = TOP(n_nationkey, 2, "asc"),'
                ' sd = ROUND(STD_DEV(n_nationkey), 4) BY n_regionkey '
                '| SORT n_regionkey | LIMIT 1', sf_dir).collect()
    assert list(rows[0].t2) == sorted(rows[0].t2)[:2]
    assert rows[0].sd is not None


def test_top_validation():
    from elasticsearch_hbase_river_spark.esql import _agg_top
    with pytest.raises(ESQLError, match="TOP takes"):
        _agg_top([None], [("field", "x")])
    with pytest.raises(ESQLError, match="positive"):
        _agg_top([None, None, None],
                 [("field", "x"), ("lit", 0), ("lit", "desc")])


# ---------------------------------------------------------------------------
# TS: the time-series command

def test_ts_two_level_semantics(spark):
    """The inner aggregate reduces per series FIRST: a chatty series must
    not outweigh a quiet one in the outer AVG."""
    from elasticsearch_hbase_river_spark.esql import TimeSeriesSpec

    rows = [  # host a: 3 samples all 10; host b: 1 sample of 40
        ("a", "2024-01-01 00:01:00", 10.0),
        ("a", "2024-01-01 00:02:00", 10.0),
        ("a", "2024-01-01 00:03:00", 10.0),
        ("b", "2024-01-01 00:04:00", 40.0),
    ]
    m = spark.createDataFrame(rows, "host string, t string, v double") \
        .selectExpr("host", "cast(t as timestamp_ntz) as t", "v")
    got = esql(spark, "TS m | STATS x = AVG(AVG_OVER_TIME(v)), "
                      "f = MIN(FIRST_OVER_TIME(v)), "
                      "l = MAX(LAST_OVER_TIME(v)), "
                      "n = SUM(COUNT_OVER_TIME(v)) "
                      "BY tb = BUCKET(t, 1 hour)",
               tables={"m": m},
               ts_specs={"m": TimeSeriesSpec("t", ("host",))}).collect()[0]
    assert got.x == 25.0          # (10 + 40) / 2 series, NOT 70/4
    assert got.f == 10.0 and got.l == 40.0 and got.n == 4


def test_ts_rate_resets_and_baseline(spark):
    """Prometheus increase: first sample is baseline, positive deltas sum,
    a reset contributes the post-reset value."""
    from elasticsearch_hbase_river_spark.esql import TimeSeriesSpec

    rows = [("h", "2024-01-01 00:00:10", 100),   # baseline
            ("h", "2024-01-01 00:10:00", 130),   # +30
            ("h", "2024-01-01 00:20:00", 5),     # reset -> +5
            ("h", "2024-01-01 00:30:00", 25)]    # +20
    m = spark.createDataFrame(rows, "host string, t string, c long") \
        .selectExpr("host", "cast(t as timestamp_ntz) as t", "c")
    got = esql(spark, "TS m | STATS r = ROUND(SUM(RATE(c)) * 3600, 4) "
                      "BY tb = BUCKET(t, 1 hour)",
               tables={"m": m},
               ts_specs={"m": TimeSeriesSpec("t", ("host",))}).collect()
    assert len(got) == 1 and got[0].r == 55.0    # 30 + 5 + 20


def test_ts_validation_errors(spark, sf_dir):
    from elasticsearch_hbase_river_spark.esql import esql as _esql
    cases = {
        "FROM events | STATS x = AVG(AVG_OVER_TIME(value))":
            "only valid inside STATS over a TS source",
        "TS events | STATS x = AVG_OVER_TIME(value)": "OUTER aggregate",
        "TS events | STATS x = SUM(RATE(value)) BY event_type":
            "needs BY",
        "TS events | STATS x = SUM(RATE(value)) "
        "BY tb = BUCKET(ts, 1 month)": "uniform span",
        "TS events | STATS x = COUNT(*) BY event_type": "at least one",
        "TS events | STATS x = SUM(SUM_OVER_TIME(value)) BY value":
            "not a series dimension",
        "TS region | STATS x = SUM(SUM_OVER_TIME(r_regionkey))":
            "not a time-series table",
    }
    for text, msg in cases.items():
        with pytest.raises(ESQLError, match=msg):
            _esql(spark, text, sf_dir).collect()


def test_ts_prefix_where_applies(spark, sf_dir):
    n_all = esql(spark, "TS events | STATS n = SUM(COUNT_OVER_TIME(value)) "
                        "BY event_type | SORT event_type", sf_dir).collect()
    n_f = esql(spark, "TS events | WHERE value > 50 "
                      "| STATS n = SUM(COUNT_OVER_TIME(value)) "
                      "BY event_type | SORT event_type", sf_dir).collect()
    assert sum(r.n for r in n_f) < sum(r.n for r in n_all)


def test_st_point_family(spark):
    row = esql(spark, 'ROW x = 1 | EVAL p = ST_POINT(-122.0, 37.0), '
               'px = ST_X(p), py = ST_Y(p), '
               'g = TO_GEOPOINT("POINT (2.5 -10.25)"), gx = ST_X(g), '
               'bad = ST_X(TO_GEOPOINT(TO_STRING("nope"))), '
               'd = ROUND(ST_DISTANCE(ST_POINT(0.0, 0.0), '
               '                      ST_POINT(1.0, 0.0)) / 1000.0, 1)'
               ).collect()[0]
    assert row.px == -122.0 and row.py == 37.0
    assert row.gx == 2.5 and row.bad is None
    assert row.d == 111.2  # one equatorial degree on the 6371.0088 sphere


def test_to_geopoint_bad_literal_is_compile_error():
    from elasticsearch_hbase_river_spark.esql import _scalar_to_geopoint
    with pytest.raises(ESQLError, match="bad WKT"):
        _scalar_to_geopoint([None], [("lit", "LINESTRING (0 0, 1 1)")])


def test_fuse_rrf_semantics(spark):
    """doc overlapping both branches outranks single-branch docs; rrf
    contribution is 1/(60 + per-branch rank)."""
    rows = [(1, 9.0, 0.0), (2, 5.0, 7.0), (3, 0.0, 8.0)]
    t = spark.createDataFrame(rows, "doc long, a double, b double")
    got = esql(spark, """
FROM t
| EVAL _id = doc
| FORK ( WHERE a > 0 | EVAL _score = a | SORT _score DESC, _id | LIMIT 5 )
       ( WHERE b > 0 | EVAL _score = b | SORT _score DESC, _id | LIMIT 5 )
| FUSE
| SORT _score DESC, _id
| KEEP _id, _score
""", tables={"t": t}).collect()
    assert [r._id for r in got] == [2, 1, 3]
    # doc 2 is rank 2 in BOTH branches; docs 1 and 3 are rank 1 in one
    assert abs(got[0]._score - (1 / 62 + 1 / 62)) < 1e-12
    assert abs(got[1]._score - 1 / 61) < 1e-12
    assert abs(got[2]._score - 1 / 61) < 1e-12


def test_fuse_linear_sums_scores(spark):
    rows = [(1, 2.0, 3.0), (2, 10.0, 0.0)]
    t = spark.createDataFrame(rows, "doc long, a double, b double")
    got = esql(spark, """
FROM t
| EVAL _id = doc
| FORK ( WHERE a > 0 | EVAL _score = a ) ( WHERE b > 0 | EVAL _score = b )
| FUSE linear
| SORT _score DESC
| KEEP _id, _score
""", tables={"t": t}).collect()
    assert [(r._id, r._score) for r in got] == [(2, 10.0), (1, 5.0)]


def test_fuse_requires_fork_id_score(spark):
    with pytest.raises(ESQLError, match="_fork"):
        esql(spark, "ROW _id = 1, _score = 1.0 | FUSE")
    t_text = ("ROW a = 1 | FORK ( EVAL b = 1 ) ( EVAL b = 2 ) | FUSE")
    with pytest.raises(ESQLError, match="_id"):
        esql(spark, t_text)


def test_dissect_right_padding_and_named_skip(spark):
    row = esql(spark, 'ROW line = "ab   cd ef" '
               '| DISSECT line "%{a->} %{?skipme} %{b}"').first()
    assert row.a == "ab" and row.b == "ef"
    assert "skipme" not in row.asDict()
    # padding on the LAST capture's trailing literal
    row2 = esql(spark, 'ROW line = "x=1;;;" '
                '| DISSECT line "x=%{v->};"').first()
    assert row2.v == "1"


def test_dissect_named_skip_requires_name():
    with pytest.raises(ESQLError, match="named skip needs a name"):
        _compile_dissect("%{a} %{?}")


def test_categorize_masks_variable_parts(spark):
    rows = esql(spark, 'ROW a = 1 | FORK '
                '( EVAL m = "Connected to 10.0.0.1 port 8080" ) '
                '( EVAL m = "Connected to 10.9.3.7 port 443" ) '
                '( EVAL m = "Disconnected after 12ms" ) '
                '| STATS n = COUNT(*) BY cat = CATEGORIZE(m) '
                '| SORT n DESC, cat').collect()
    assert [(r.cat, r.n) for r in rows] == [
        ("Connected to port", 2), ("Disconnected after ms", 1)]


def test_mv_percentile_and_mad(spark):
    row = esql(spark, 'ROW a = 1 | EVAL v = MV_APPEND(MV_APPEND('
               'MV_APPEND(SPLIT("1", ","), SPLIT("2", ",")), '
               'SPLIT("3", ",")), SPLIT("4", ",")), '
               'p50 = MV_PERCENTILE(v, 50), p0 = MV_PERCENTILE(v, 0), '
               'p100 = MV_PERCENTILE(v, 100), '
               'mad = MV_MEDIAN_ABSOLUTE_DEVIATION(v)').collect()[0]
    assert row.p50 == 2.5 and row.p0 == 1.0 and row.p100 == 4.0
    # median 2.5; |devs| = [1.5, 0.5, 0.5, 1.5]; median of devs = 1.0
    assert row.mad == 1.0


def test_grok_inline_named_capture(spark):
    row = esql(spark, 'ROW line = "req id=ab12 took 35ms" '
               '| GROK line "req id=(?<rid>[a-z0-9]+) took '
               '%{INT:ms:int}ms"').first()
    assert row.rid == "ab12" and row.ms == 35


def test_grok_inline_nested_ref_refused():
    with pytest.raises(ESQLError, match="outside the subset"):
        _compile_grok("(?<a>%{INT})")


def test_bucket_multi_unit_span(spark):
    row = esql(spark, 'ROW t = TO_DATETIME("2024-03-01 13:47:09") '
               '| EVAL q = BUCKET(t, 15 minute), h = BUCKET(t, 6 hour)'
               ).first()
    assert str(row.q) == "2024-03-01 13:45:00"
    assert str(row.h) == "2024-03-01 12:00:00"
    # calendar multi-unit: exact epoch-month grid (March -> January)
    row = esql(spark, 'ROW t = TO_DATETIME("2024-03-01 13:47:09") '
                      '| EVAL m = BUCKET(t, 3 month)').first()
    assert str(row.m) == "2024-01-01 00:00:00"


def test_round_to_points(spark):
    row = esql(spark, 'ROW a = 1 | EVAL '
               'lo = ROUND_TO(-5.0, 0, 50), mid = ROUND_TO(72.5, 0, 50, 100),'
               ' hi = ROUND_TO(450.0, 0, 50, 100, 200), '
               'neg = ROUND_TO(-3.0, -10, 0, 10)').first()
    assert row.lo == 0 and row.mid == 50 and row.hi == 200 and row.neg == -10
    with pytest.raises(ESQLError, match="numeric literals"):
        esql(spark, "ROW a = 1 | EVAL t = ROUND_TO(a, a)")


# ---------------------------------------------------------------------------
# round-9 continuation: NOW/span arithmetic, MATCH_PHRASE, QSTR,
# MV_PSERIES_WEIGHTED_SUM, array literals, order-free TS averages


def test_now_pinned_and_span_arithmetic(spark):
    from datetime import datetime
    row = esql(spark, 'ROW x = 1 | EVAL lo = NOW() - 7 day, '
                      'hi = NOW() + 3 hour, rev = 1 day + NOW()',
               now=datetime(2024, 1, 25)).collect()[0]
    assert row.lo == datetime(2024, 1, 18)
    assert row.hi == datetime(2024, 1, 25, 3)
    assert row.rev == datetime(2024, 1, 26)  # span + ts commutes


def test_now_takes_no_args(spark):
    with pytest.raises(ESQLError, match="NOW takes no arguments"):
        esql(spark, 'ROW x = NOW(1)')


def test_span_minus_datetime_refused(spark):
    with pytest.raises(ESQLError, match="added to or subtracted"):
        esql(spark, 'ROW x = 1 | EVAL y = 1 day - NOW()')


def test_match_phrase_consecutive_in_order(spark):
    row = esql(spark, 'ROW body = "The Quick, brown FOX jumps" '
                      '| EVAL hit = MATCH_PHRASE(body, "quick BROWN fox"), '
                      'rev = MATCH_PHRASE(body, "brown quick"), '
                      'gap = MATCH_PHRASE(body, "quick fox")').collect()[0]
    assert row.hit is True and row.rev is False and row.gap is False


def test_qstr_clause_semantics(spark):
    q = ('ROW body = "Spark merges fast batches" '
         '| EVAL a = QSTR("+body:spark -body:slow body:zzz"), '
         'b = QSTR("body:batch*"), '
         'c = QSTR("-body:spark"), '
         'd = QSTR("body:zzz body:merges")')
    row = esql(spark, q).collect()[0]
    assert row.a is True        # must + absent-must_not; should boost-only
    assert row.b is True        # trailing * prefix clause
    assert row.c is False       # must_not hits
    assert row.d is True        # bare should: at least one matches


def test_qstr_rejects_unknown_column_and_bad_clause(spark):
    with pytest.raises(ESQLError, match="unknown column"):
        esql(spark, 'ROW a = "x" | WHERE QSTR("b:term")')
    with pytest.raises(ESQLError, match="unsupported clause"):
        esql(spark, 'ROW a = "x" | WHERE QSTR("bare")')
    with pytest.raises(ESQLError, match="one string literal"):
        esql(spark, 'ROW a = "x" | WHERE QSTR(a)')


def test_mv_pseries_weighted_sum(spark):
    row = esql(spark, 'ROW v = [10.0, 4.0, 2.0] '
                      '| EVAL s = MV_PSERIES_WEIGHTED_SUM(v, 1.5), '
                      'one = MV_PSERIES_WEIGHTED_SUM([7.5], 2.0)'
               ).collect()[0]
    expect = 10.0 / 1.0 + 4.0 / 2.0 ** 1.5 + 2.0 / 3.0 ** 1.5
    assert abs(row.s - expect) < 1e-12
    assert row.one == 7.5


def test_array_literal_and_empty_refused(spark):
    row = esql(spark, 'ROW x = 1 | EVAL a = [1, 2, 3], n = MV_COUNT(a)'
               ).collect()[0]
    assert list(row.a) == [1, 2, 3] and row.n == 3
    with pytest.raises(ESQLError, match="empty"):
        esql(spark, 'ROW x = 1 | EVAL a = []')


def test_ts_avg_is_order_free(spark):
    """The exact-decimal TS average must not depend on partitioning:
    1 and 32 shuffle partitions give bit-identical load values."""
    from elasticsearch_hbase_river_spark.esql import TimeSeriesSpec

    rows = [("h%d" % (i % 7), "2024-01-01 00:%02d:00" % (i % 60),
             (i * 37 % 1000) / 7.0) for i in range(500)]
    m = (spark.createDataFrame(rows, "host string, t string, v double")
         .selectExpr("host", "cast(t as timestamp_ntz) as t", "v"))
    text = ("TS m | STATS load = AVG(AVG_OVER_TIME(v)) "
            "BY tb = BUCKET(t, 1 hour)")
    spec = {"m": TimeSeriesSpec("t", ("host",))}
    a = esql(spark, text, tables={"m": m.repartition(1)},
             ts_specs=spec).collect()
    b = esql(spark, text, tables={"m": m.repartition(32)},
             ts_specs=spec).collect()
    assert [(r.tb, r.load) for r in a] == [(r.tb, r.load) for r in b]


def test_metadata_score_match_chains_sum(spark):
    """Two chained scored WHERE MATCH stages each add their BM25
    contribution to _score; a non-scoring filter leaves it alone."""
    rows = [(1, "spark joins data"), (2, "spark spark spark"),
            (3, "window functions"), (4, "nothing relevant")]
    t = spark.createDataFrame(rows, "doc_id long, text string")
    out = esql(spark, 'FROM d METADATA _score '
                      '| WHERE MATCH(text, "spark") '
                      '| WHERE doc_id < 3 '
                      '| SORT _score DESC, doc_id',
               tables={"d": t}).collect()
    assert [r.doc_id for r in out] == [2, 1]
    assert all(r._score > 0 for r in out)
    two = esql(spark, 'FROM d METADATA _score '
                      '| WHERE MATCH(text, "spark") '
                      '| WHERE MATCH(text, "joins") '
                      '| SORT _score DESC, doc_id',
               tables={"d": t}).collect()
    # each scored stage FILTERS (its own OR semantics) and ADDS score:
    # only doc 1 contains both terms, and its score grew
    assert [r.doc_id for r in two] == [1]
    one = {r.doc_id: r._score for r in out}
    assert two[0]._score > one[1]              # second stage added score


def test_metadata_score_errors(spark):
    t = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ESQLError, match="ENTIRE WHERE predicate"):
        esql(spark, 'FROM d METADATA _score '
                    '| WHERE MATCH(text, "x") AND doc_id > 0',
             tables={"d": t})
    with pytest.raises(ESQLError, match="outside the subset"):
        esql(spark, 'FROM d METADATA _score '
                    '| WHERE MATCH_PHRASE(text, "x y")', tables={"d": t})
    with pytest.raises(ESQLError, match="analyzes to no tokens"):
        esql(spark, 'FROM d METADATA _score | WHERE MATCH(text, "---")',
             tables={"d": t})
    with pytest.raises(ESQLError, match="only METADATA _index and _score"):
        parse('FROM d METADATA _version')


def test_knn_top_k_and_validation(spark):
    rows = [(i, [float(i), 1.0]) for i in range(20)]
    t = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    out = esql(spark, 'FROM d METADATA _score '
                      '| WHERE KNN(emb, [1.0, 1.0], 3) '
                      '| SORT _score DESC, vec_id',
               tables={"d": t}).collect()
    assert len(out) == 3 and out[0].vec_id == 1   # [1,1] is the direction
    with pytest.raises(ESQLError, match="entire WHERE predicate"):
        esql(spark, 'FROM d | EVAL s = KNN(emb, [1.0], 1)', tables={"d": t})
    with pytest.raises(ESQLError, match="ENTIRE WHERE predicate"):
        esql(spark, 'FROM d | WHERE KNN(emb, [1.0, 1.0], 3) AND vec_id > 0',
             tables={"d": t})
    with pytest.raises(ESQLError, match="k must be positive"):
        esql(spark, 'FROM d | WHERE KNN(emb, [1.0, 1.0], 0)',
             tables={"d": t})
    with pytest.raises(Exception, match="dimensions"):
        esql(spark, 'FROM d | WHERE KNN(emb, [1.0, 2.0, 3.0], 2)',
             tables={"d": t}).collect()


def test_knn_plan_is_take_ordered(spark, sf_dir):
    plan = esql(spark, 'FROM embeddings METADATA _score '
                       '| WHERE KNN(embedding, [1.0], 5)',
                sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_spatial_relations_point_in_polygon(spark):
    rows = [(1, -120.0, 30.0), (2, 0.0, 0.0), (3, 40.0, 10.0)]
    t = spark.createDataFrame(rows, "id long, lon double, lat double")
    poly = 'TO_GEOSHAPE("POLYGON ((-150 60, -100 -50, 30 55, -150 60))")'
    out = esql(spark, f'FROM g | EVAL p = ST_POINT(lon, lat) '
                      f'| EVAL w = ST_WITHIN(p, {poly}), '
                      f'i = ST_INTERSECTS({poly}, p), '
                      f'c = ST_CONTAINS({poly}, p), '
                      f'd = ST_DISJOINT(p, {poly}) | SORT id',
               tables={"g": t}).collect()
    assert [(r.w, r.i, r.c, r.d) for r in out] == [
        (True, True, True, False), (False, False, False, True),
        (False, False, False, True)]


def test_spatial_ray_cast_matches_cross_product_oracle(spark, sf_dir):
    """The ES|QL ray cast and the DSL pack's cross-product triangle test
    must agree on every fixture point (different algorithms, same
    region)."""
    from elasticsearch_hbase_river_spark.operators.esdsl3 import _geo_users
    from elasticsearch_hbase_river_spark.operators.esdsl6 import (
        q_geo_polygon,
    )
    g = _geo_users(spark, sf_dir)
    poly = 'TO_GEOSHAPE("POLYGON ((-150 60, -100 -50, 30 55, -150 60))")'
    mine = esql(spark, f'FROM geo_users '
                       f'| EVAL p = ST_POINT(lon, lat) '
                       f'| WHERE ST_WITHIN(p, {poly}) '
                       f'| KEEP user_id | SORT user_id',
                tables={"geo_users": g})
    theirs = q_geo_polygon(spark, sf_dir).select("user_id") \
        .orderBy("user_id")
    assert [r.user_id for r in mine.collect()] == \
           [r.user_id for r in theirs.collect()]


def test_spatial_envelope_and_validation(spark):
    row = esql(spark, 'ROW x = 1 | EVAL e = ST_ENVELOPE(TO_GEOSHAPE('
                      '"POLYGON ((0 0, 10 0, 10 5, 0 5, 0 0))")), '
                      'a = ST_XMIN(e), b = ST_XMAX(e), '
                      'c = ST_YMIN(e), d = ST_YMAX(e)').collect()[0]
    assert (row.a, row.b, row.c, row.d) == (0.0, 10.0, 0.0, 5.0)
    with pytest.raises(ESQLError, match="only valid as a literal"):
        esql(spark, 'ROW x = 1 | EVAL g = TO_GEOSHAPE("POLYGON '
                    '((0 0, 1 0, 1 1, 0 0))")')
    with pytest.raises(ESQLError, match="exactly one argument"):
        esql(spark, 'ROW x = 1 | EVAL w = ST_WITHIN(ST_POINT(1.0, 1.0), '
                    'ST_POINT(2.0, 2.0))')
    with pytest.raises(ESQLError, match="POLYGON / MULTIPOLYGON"):
        esql(spark, 'ROW x = 1 | EVAL w = ST_WITHIN(ST_POINT(1.0, 1.0), '
                    'TO_GEOSHAPE("LINESTRING (0 0, 1 1)"))')


def test_spatial_centroid_extent_aggs(spark):
    rows = [(i, float(i), float(10 - i)) for i in range(5)]
    t = spark.createDataFrame(rows, "id long, lon double, lat double")
    row = esql(spark, 'FROM g | EVAL p = ST_POINT(lon, lat) '
                      '| STATS c = ST_CENTROID_AGG(p), '
                      'e = ST_EXTENT_AGG(p) '
                      '| EVAL cx = ST_X(c), cy = ST_Y(c), '
                      'x0 = ST_XMIN(e), x1 = ST_XMAX(e), '
                      'y0 = ST_YMIN(e), y1 = ST_YMAX(e)',
               tables={"g": t}).collect()[0]
    assert (row.cx, row.cy) == (2.0, 8.0)
    assert (row.x0, row.x1, row.y0, row.y1) == (0.0, 4.0, 6.0, 10.0)


def test_rerank_replaces_score_rowlocal(spark):
    rows = [(1, "spark fast merge here"), (2, "spark only"),
            (3, "nothing at all")]
    t = spark.createDataFrame(rows, "doc_id long, text string")
    out = esql(spark, 'FROM d METADATA _score '
                      '| WHERE MATCH(text, "spark nothing") '
                      '| RERANK "spark fast merge" ON text '
                      '| SORT _score DESC, doc_id',
               tables={"d": t}).collect()
    got = {r.doc_id: r._score for r in out}
    assert got[1] == 1.0
    assert abs(got[2] - 1 / 3) < 1e-6
    assert abs(got[3] - 0.0) < 1e-9   # matched "nothing", reranked to 0


def test_rerank_validation(spark):
    t = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ESQLError, match="needs METADATA _score"):
        esql(spark, 'FROM d | RERANK "q" ON text', tables={"d": t})
    with pytest.raises(ESQLError, match="analyzes to no tokens"):
        esql(spark, 'FROM d METADATA _score | RERANK "---" ON text',
             tables={"d": t})
    with pytest.raises(ESQLError, match="quoted query"):
        parse('FROM d | RERANK q ON text')


def test_chunk_text_windows_and_overlap(spark):
    out = esql(spark, 'ROW t = "a b c d e f g" '
                      '| EVAL c = CHUNK_TEXT(t, 3, 1) '
                      '| MV_EXPAND c | KEEP c').collect()
    assert [r.c for r in out] == ["a b c", "c d e", "e f g"]
    short = esql(spark, 'ROW t = "a b" | EVAL c = CHUNK_TEXT(t, 5, 2), '
                        'n = MV_COUNT(c) | KEEP c, n').collect()[0]
    assert list(short.c) == ["a b"] and short.n == 1
    empty = esql(spark, 'ROW t = "   " | EVAL c = CHUNK_TEXT(t, 5, 0), '
                        'n = MV_COUNT(c) | KEEP n').collect()[0]
    assert empty.n == 0
    with pytest.raises(ESQLError, match="overlap < size"):
        esql(spark, 'ROW t = "x" | EVAL c = CHUNK_TEXT(t, 3, 3)')
    with pytest.raises(ESQLError, match="top-level expression"):
        esql(spark, 'ROW t = "x" | WHERE MV_COUNT(CHUNK_TEXT(t, 3, 1)) > 0')


def test_text_embedding_deterministic_and_signed(spark):
    one = esql(spark, 'ROW t = "spark join" '
                      '| EVAL e = TEXT_EMBEDDING(t, 4)').collect()[0].e
    again = esql(spark, 'ROW t = "spark join" '
                        '| EVAL e = TEXT_EMBEDDING(t, 4)').collect()[0].e
    assert list(one) == list(again) and len(one) == 4
    assert sum(abs(x) for x in one) == 2.0   # two tokens, ±1 each
    doubled = esql(spark, 'ROW t = "spark join spark join" '
                          '| EVAL e = TEXT_EMBEDDING(t, 4)').collect()[0].e
    assert [2 * x for x in one] == list(doubled)   # counts, linear
    with pytest.raises(ESQLError, match="dims must be in"):
        esql(spark, 'ROW t = "x" | EVAL e = TEXT_EMBEDDING(t, 0)')


def test_change_point_spike_and_dip(spark, tmp_path):
    src = str(tmp_path / "cp_spike")
    spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 10.0), (4, 200.0), (5, 10.0),
         (6, 10.0), (7, 10.0)], "k int, v double").write.parquet(src)
    rows = esql(spark, "FROM t | CHANGE_POINT v ON k AS cp, pv | SORT k",
                tables={"t": spark.read.parquet(src)}).collect()
    marked = [r for r in rows if r.cp is not None]
    assert len(marked) == 1
    assert marked[0].k == 4 and marked[0].cp == "spike"

    src2 = str(tmp_path / "cp_dip")
    spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 100.0), (4, 1.0), (5, 100.0),
         (6, 100.0), (7, 100.0)], "k int, v double").write.parquet(src2)
    rows = esql(spark, "FROM t | CHANGE_POINT v ON k AS cp, pv | SORT k",
                tables={"t": spark.read.parquet(src2)}).collect()
    marked = [r for r in rows if r.cp is not None]
    assert marked[0].k == 4 and marked[0].cp == "dip"


def test_change_point_step_still_wins_on_level_shift(spark, tmp_path):
    src = str(tmp_path / "cp_step2")
    spark.createDataFrame(
        [(i, 10.0) for i in range(1, 5)] + [(i, 100.0) for i in range(5, 9)],
        "k int, v double").write.parquet(src)
    rows = esql(spark, "FROM t | CHANGE_POINT v ON k AS cp, pv | SORT k",
                tables={"t": spark.read.parquet(src)}).collect()
    marked = [r for r in rows if r.cp is not None]
    assert marked[0].k == 5 and marked[0].cp == "step_change"


def test_ts_prom_family_semantics(spark):
    """DELTA = last-first; INCREASE = reset-aware positive-delta sum;
    IRATE = last adjusted delta over its interval."""
    from elasticsearch_hbase_river_spark.esql import TimeSeriesSpec

    rows = [("h", "2024-01-01 00:00:00", 100),
            ("h", "2024-01-01 00:10:00", 130),   # +30 over 600 s
            ("h", "2024-01-01 00:20:00", 5),     # reset -> +5
            ("h", "2024-01-01 00:30:00", 25)]    # +20 over 600 s
    m = spark.createDataFrame(rows, "host string, t string, c long") \
        .selectExpr("host", "cast(t as timestamp_ntz) as t", "c")
    got = esql(spark, "TS m | STATS d = SUM(DELTA(c)), "
                      "inc = SUM(INCREASE(c)), "
                      "ir = ROUND(SUM(IRATE(c)) * 600, 4) "
                      "BY tb = BUCKET(t, 1 hour)",
               tables={"m": m},
               ts_specs={"m": TimeSeriesSpec("t", ("host",))}).collect()
    assert len(got) == 1
    assert got[0].d == 25 - 100          # last - first, signed
    assert got[0].inc == 55.0            # 30 + 5 + 20
    assert got[0].ir == 20.0             # last delta 20 over 600 s


def test_ts_prom_requires_bucket(spark, sf_dir):
    with pytest.raises(ESQLError, match="needs BY"):
        esql(spark, "TS events | STATS x = SUM(INCREASE(value)) "
                    "BY event_type", sf_dir)


def test_colon_match_operator(spark):
    t = spark.createDataFrame([(1, "spark joins data"), (2, "nothing")],
                              "doc_id long, text string")
    out = esql(spark, 'FROM d | WHERE text : "spark" | KEEP doc_id',
               tables={"d": t}).collect()
    assert [r.doc_id for r in out] == [1]
    scored = esql(spark, 'FROM d METADATA _score '
                         '| WHERE text : "spark joins"',
                  tables={"d": t}).collect()
    assert len(scored) == 1 and scored[0]._score > 0
    with pytest.raises(ESQLError, match="quoted query"):
        parse('FROM d | WHERE text : 5')
    with pytest.raises(ESQLError, match="field on its left"):
        parse('FROM d | WHERE LENGTH(text) : "x"')


def test_term_exact_and_mad_sample_aggs(spark):
    t = spark.createDataFrame(
        [(1, "Spark, runs", 10.0), (2, "sparky", 20.0), (3, "spark", 40.0)],
        "doc_id long, text string, v double")
    out = esql(spark, 'FROM d | WHERE TERM(text, "spark") | KEEP doc_id '
                      '| SORT doc_id', tables={"d": t}).collect()
    assert [r.doc_id for r in out] == [1, 3]   # 'sparky' is a different term
    agg = esql(spark, 'FROM d | STATS mad = MEDIAN_ABSOLUTE_DEVIATION(v), '
                      'sm = SAMPLE(doc_id, 2)', tables={"d": t}).collect()[0]
    assert agg.mad == 10.0                      # median 20; |dev| = 10,0,20
    assert len(agg.sm) == 2 and set(agg.sm) <= {1, 2, 3}
    again = esql(spark, 'FROM d | STATS sm = SAMPLE(doc_id, 2)',
                 tables={"d": t}).collect()[0]
    assert list(agg.sm) == list(again.sm)       # deterministic draw
    with pytest.raises(ESQLError, match="positive literal limit"):
        esql(spark, 'FROM d | STATS s = SAMPLE(doc_id, 0)', tables={"d": t})


def test_cli_esql_explain_prints_plan(spark, sf_dir, capsys):
    from elasticsearch_hbase_river_spark.__main__ import main

    rc = main(["esql",
               "FROM events | WHERE value > 50 "
               "| STATS n = COUNT(*) BY event_type "
               "| SORT n DESC, event_type | LIMIT 3",
               "--data", sf_dir, "--explain"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "TakeOrderedAndProject" in out        # SORT|LIMIT folded
    assert "PushedFilters" in out                # WHERE reached the scan


def test_kql_predicate(spark):
    t = spark.createDataFrame(
        [(1, "spark joins data fast", 10.0),
         (2, "slow batch window", 90.0),
         (3, "spark window", 50.0)],
        "doc_id long, text string, v double")

    def run(q):
        esc = q.replace('"', '\\"')
        return sorted(r.doc_id for r in esql(
            spark, f'FROM d | WHERE KQL("{esc}") | KEEP doc_id',
            tables={"d": t}).collect())

    assert run("text:spark") == [1, 3]
    assert run("text:spark AND v >= 50") == [3]
    assert run("text:spark OR text:batch") == [1, 2, 3]
    assert run("NOT text:spark AND v > 10") == [2]
    assert run("(text:spark OR text:slow) AND v < 60") == [1, 3]
    assert run("text:join*") == [1]
    assert run('text:"spark joins"') == [1]      # quoted = phrase
    from elasticsearch_hbase_river_spark.esql import ESQLError as E
    import pytest as _pt
    with _pt.raises(E, match="unknown column"):
        run("nope:x")
    with _pt.raises(E, match="range needs a numeric"):
        run("v > abc")
    with _pt.raises(E, match="missing \\)"):
        run("(text:spark")


def test_match_and_operator(spark):
    t = spark.createDataFrame(
        [(1, "spark joins data"), (2, "spark only"), (3, "joins only")],
        "doc_id long, text string")
    both = esql(spark, 'FROM d | WHERE MATCH(text, "spark joins", "and") '
                       '| KEEP doc_id | SORT doc_id',
                tables={"d": t}).collect()
    assert [r.doc_id for r in both] == [1]
    either = esql(spark, 'FROM d | WHERE MATCH(text, "spark joins") '
                         '| KEEP doc_id | SORT doc_id',
                  tables={"d": t}).collect()
    assert [r.doc_id for r in either] == [1, 2, 3]
    scored = esql(spark, 'FROM d METADATA _score '
                         '| WHERE MATCH(text, "spark joins", "and")',
                  tables={"d": t}).collect()
    assert len(scored) == 1 and scored[0].doc_id == 1
    with pytest.raises(ESQLError, match='literal "and" or "or"'):
        esql(spark, 'FROM d | WHERE MATCH(text, "x", "xor")',
             tables={"d": t})


def test_inlinestats_computed_by(spark):
    t = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)],
        "id long, v double")
    out = esql(spark, 'FROM d '
                      '| INLINESTATS n = COUNT(*), s = SUM(v) '
                      '  BY par = id % 2 '
                      '| SORT id', tables={"d": t}).collect()
    assert [r.par for r in out] == [1, 0, 1, 0]
    assert all(r.n == 2 for r in out)
    assert [r.s for r in out] == [40.0, 60.0, 40.0, 60.0]
    with pytest.raises(ESQLError, match="explicit"):
        esql(spark, 'FROM d | INLINESTATS n = COUNT(*) BY id % 2',
             tables={"d": t})


def test_show_info(spark):
    row = esql(spark, 'SHOW INFO').collect()
    assert len(row) == 1 and row[0].version and row[0].spark_version
    row2 = esql(spark, 'SHOW INFO | KEEP version').collect()[0]
    assert row2.version == row[0].version
    with pytest.raises(ESQLError, match="expected"):
        parse('SHOW TABLES')


def test_kql_qstr_parser_totality_property(spark):
    """KQL/QSTR mini-parsers are TOTAL over arbitrary query strings:
    they either compile or raise ESQLError — never IndexError/KeyError.
    (Column construction only — no Spark job per example.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    t = spark.createDataFrame([(1, "x", 1.0)],
                              "doc_id long, text string, v double")

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet='abtextv: ()"*<>=ANDORNT+-.0123', max_size=30))
    def check(q):
        esc = q.replace("\\", "\\\\").replace('"', '\\"')
        for fn in ("KQL", "QSTR"):
            try:
                esql(spark, f'FROM d | WHERE {fn}("{esc}")',
                     tables={"d": t})
            except ESQLError:
                pass

    check()


def test_scored_match_plan_broadcasts_stats(spark, sf_dir):
    """Scored MATCH's corpus statistics ride a broadcast 1-row relation
    (never a shuffle join), and the SORT _score | LIMIT funnel folds to
    TakeOrderedAndProject."""
    plan = esql(spark, 'FROM documents METADATA _score '
                       '| WHERE MATCH(text, "spark join") '
                       '| SORT _score DESC, doc_id | LIMIT 10',
                sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_completion_extractive_standin(spark):
    t = spark.createDataFrame(
        [(1, "First sentence. Second part here."),
         (2, "no punctuation at all"),
         (3, "  padded! rest")],
        "doc_id long, text string")
    out = esql(spark, 'FROM d '
                      '| COMPLETION summary = CONCAT("Summarize: ", text) '
                      '| KEEP doc_id, summary | SORT doc_id',
               tables={"d": t}).collect()
    assert out[0].summary == "Summarize: First sentence."
    assert out[1].summary == "Summarize: no punctuation at all"
    # internal whitespace is content; only the ends trim
    assert out[2].summary == "Summarize:   padded!"


# ---------------------------------------------------------------------------
# round-10 ADVICE regressions: null-tolerant KNN / MATCH stats, integer
# spans, mapping-dispatched KQL terms, tie-deterministic TS picks


def test_knn_skips_null_embeddings(spark):
    """ES knn skips docs missing the field; a NULL vector must not trip
    the in-plan dimension check (size(NULL) is -1 under legacy
    sizeOfNull) and abort the query."""
    t = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.5, 0.5])],
        "vec_id long, emb array<double>")
    out = esql(spark, 'FROM d | WHERE KNN(emb, [1.0, 1.0], 5) '
                      '| SORT vec_id', tables={"d": t}).collect()
    assert [r.vec_id for r in out] == [1, 3]
    # a genuinely mismatched NON-null vector still raises in-plan
    with pytest.raises(Exception, match="dimensions"):
        esql(spark, 'FROM d | WHERE KNN(emb, [1.0, 1.0, 1.0], 5)',
             tables={"d": t}).collect()


def test_scored_match_corpus_stats_skip_null_rows(spark):
    """BM25 corpus stats (N, avgdl) count only rows where the field is
    present — a NULL-text row must not perturb any score (the DuckDB
    oracle's len(NULL) is NULL and skipped)."""
    rows = [(1, "spark engine"), (2, None), (3, "spark spark data fast")]
    t = spark.createDataFrame(rows, "doc_id long, text string")
    t2 = spark.createDataFrame([r for r in rows if r[1] is not None],
                               "doc_id long, text string")
    q = ('FROM d METADATA _score | WHERE MATCH(text, "spark") '
         '| KEEP doc_id, _score | SORT doc_id')
    a = [(r.doc_id, r["_score"]) for r in
         esql(spark, q, tables={"d": t}).collect()]
    b = [(r.doc_id, r["_score"]) for r in
         esql(spark, q, tables={"d": t2}).collect()]
    assert a == b and len(a) == 2


def test_span_fractional_quantity_rejected(spark):
    """ES|QL time spans are integer-quantified: 1.5 hour is an error,
    never a silent truncation to 1 hour."""
    t = spark.createDataFrame([("2024-01-01 00:00:00",)], "t string") \
        .selectExpr("cast(t as timestamp_ntz) as ts")
    with pytest.raises(ESQLError, match="integer"):
        esql(spark, 'FROM d | EVAL x = ts + 1.5 hour', tables={"d": t})
    out = esql(spark, 'FROM d | EVAL x = ts + 2 hour',
               tables={"d": t}).collect()[0]
    assert str(out.x).startswith("2024-01-01 02:00:00")


def test_kql_term_dispatch_on_column_dtype(spark):
    """KQL dispatches on the field MAPPING (column dtype), not the
    value's shape: text:404 is an analyzed term match on token "404";
    numeric:404 is numeric equality; numeric:abc is an error."""
    t = spark.createDataFrame(
        [(1, "error 404 page", 404.0), (2, "ok 200", 200.0),
         (3, "code 404 again", 200.0)],
        "id long, text string, code double")

    def run(q):
        esc = q.replace('"', '\\"')
        return sorted(r.id for r in esql(
            spark, f'FROM d | WHERE KQL("{esc}") | KEEP id',
            tables={"d": t}).collect())

    assert run("text:404") == [1, 3]       # term match, not cast-to-double
    assert run("code:404") == [1]          # numeric equality
    assert run("text:404 AND code:200") == [3]
    with pytest.raises(ESQLError, match="numeric field"):
        run("code:abc")


def test_ts_delta_first_last_tie_deterministic(spark):
    """Two samples sharing a timestamp: DELTA / FIRST / LAST break the
    tie on the sample value (max for last, min for first), so the result
    does not depend on partial-aggregation merge order."""
    from elasticsearch_hbase_river_spark.esql import TimeSeriesSpec

    rows = [("h", "2024-01-01 00:01:00", 7.0),
            ("h", "2024-01-01 00:01:00", 3.0),   # tie at the start
            ("h", "2024-01-01 00:09:00", 20.0),
            ("h", "2024-01-01 00:09:00", 30.0)]  # tie at the end
    m = spark.createDataFrame(rows, "host string, t string, v double") \
        .selectExpr("host", "cast(t as timestamp_ntz) as t", "v")
    for parts in (1, 4):   # merge order must not matter
        got = esql(spark, "TS m2 | STATS d = SUM(DELTA(v)), "
                          "f = MIN(FIRST_OVER_TIME(v)), "
                          "l = MAX(LAST_OVER_TIME(v)) "
                          "BY tb = BUCKET(t, 1 hour)",
                   tables={"m2": m.repartition(parts)},
                   ts_specs={"m2": TimeSeriesSpec("t", ("host",))}
                   ).collect()[0]
        assert (got.d, got.f, got.l) == (27.0, 3.0, 30.0)


def test_date_trunc_multi_unit_grid(spark):
    """Multi-unit uniform spans truncate onto the epoch-anchored grid
    (same math as BUCKET); calendar multi-unit spans floor in exact
    month arithmetic on the epoch-month grid."""
    t = spark.createDataFrame(
        [("2024-01-01 07:45:00",), ("2024-01-01 14:10:00",)],
        "t string").selectExpr("cast(t as timestamp_ntz) as ts")
    out = esql(spark, 'FROM d | EVAL b = DATE_TRUNC(6 hour, ts) | SORT ts',
               tables={"d": t}).collect()
    assert [str(r.b) for r in out] == [
        "2024-01-01 06:00:00", "2024-01-01 12:00:00"]
    out = esql(spark, 'FROM d | EVAL b = DATE_TRUNC(15 minute, ts) '
                      '| SORT ts', tables={"d": t}).collect()
    assert [str(r.b) for r in out] == [
        "2024-01-01 07:45:00", "2024-01-01 14:00:00"]


def test_date_trunc_calendar_multi_unit(spark):
    """DATE_TRUNC(3 month / 2 quarter / 5 year, ts): exact month
    arithmetic anchored at 1970-01 (ES Rounding semantics) — February
    in a 3-month grid lands on January, never a fixed-width
    approximation; a 5-year grid anchored at 1970 lands 2024 on 2020."""
    rows = [("2024-02-20 10:00:00",), ("2024-03-31 23:59:59",),
            ("2024-04-01 00:00:00",), ("1969-12-31 23:00:00",)]
    t = spark.createDataFrame(rows, "t string") \
        .selectExpr("cast(t as timestamp_ntz) as ts")
    got = [str(r.b) for r in esql(
        spark, 'FROM d | EVAL b = DATE_TRUNC(3 month, ts) | SORT ts',
        tables={"d": t}).collect()]
    assert got == ["1969-10-01 00:00:00", "2024-01-01 00:00:00",
                   "2024-01-01 00:00:00", "2024-04-01 00:00:00"]
    got = [str(r.b) for r in esql(
        spark, 'FROM d | EVAL b = DATE_TRUNC(2 quarter, ts) | SORT ts',
        tables={"d": t}).collect()]
    assert got == ["1969-07-01 00:00:00", "2024-01-01 00:00:00",
                   "2024-01-01 00:00:00", "2024-01-01 00:00:00"]
    got = [str(r.b) for r in esql(
        spark, 'FROM d | EVAL b = DATE_TRUNC(5 year, ts) | SORT ts',
        tables={"d": t}).collect()]
    assert got == ["1965-01-01 00:00:00", "2020-01-01 00:00:00",
                   "2020-01-01 00:00:00", "2020-01-01 00:00:00"]
    with pytest.raises(ESQLError, match="positive"):
        esql(spark, 'FROM d | EVAL b = DATE_TRUNC(0 month, ts)',
             tables={"d": t})


def test_kql_date_range_comparisons(spark):
    """KQL ranges on a temporal column parse the value as an ISO
    date/datetime against the column's own type."""
    t = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-02-15 12:00:00"),
         (3, "2024-03-01 00:00:00")],
        "id long, t string").selectExpr(
        "id", "cast(t as timestamp_ntz) as ts")

    def run(q):
        esc = q.replace('"', '\\"')
        return sorted(r.id for r in esql(
            spark, f'FROM d | WHERE KQL("{esc}") | KEEP id',
            tables={"d": t}).collect())

    assert run("ts >= 2024-02-01") == [2, 3]
    assert run('ts < "2024-02-15 12:00:00"') == [1]
    assert run("ts >= 2024-01-01 AND ts <= 2024-02-28") == [1, 2]
    with pytest.raises(ESQLError, match="ISO date"):
        run("ts >= notadate")


def test_to_ip_ipv6_rfc5952(spark):
    """TO_IP canonicalizes IPv6 per RFC 5952: lowercase, leading zeros
    stripped, the leftmost-longest run of >= 2 zero groups compressed;
    single zero groups never compress; dotted-quad tails parse per RFC
    4291 §2.2.3 and IPv4-MAPPED values render AS the dotted quad (the
    Java InetAddress / ES rule); malformed forms fold to null."""
    cases = [
        ("2001:0db8:0:0:0:0:2:1", "2001:db8::2:1"),
        ("1:0:0:2:0:0:0:3", "1:0:0:2::3"),        # longest wins
        ("0:0:1:0:0:0:0:1", "0:0:1::1"),          # leftmost on longer right
        ("1:0:0:0:2:0:0:0", "1::2:0:0:0"),        # leftmost on equal, trailing
        ("2001:DB8::8:800:200C:417A", "2001:db8::8:800:200c:417a"),
        ("0:0:0:0:0:0:0:1", "::1"),
        ("::", "::"),
        ("1::", "1::"),
        ("fe80:0:0:0:0:0:0:0", "fe80::"),
        ("1:2:3:4:5:6:7:8", "1:2:3:4:5:6:7:8"),
        ("10.1.2.3", "10.1.2.3"),
        ("1::2::3", None), ("12345::1", None), ("g::1", None),
        ("1:2:3:4:5:6:7", None),
        # v4-embedded tails + the mapped range (RFC 4291 / Java rules)
        ("::ffff:1.2.3.4", "1.2.3.4"),
        ("::FFFF:255.255.255.255", "255.255.255.255"),
        ("::ffff:102:304", "1.2.3.4"),            # pure-hex mapped value
        ("0:0:0:0:0:ffff:a00:1", "10.0.0.1"),
        ("::1.2.3.4", "::102:304"),               # v4-COMPATIBLE: hex form
        ("1:2:3:4:5:6:1.2.3.4", "1:2:3:4:5:6:102:304"),
        ("::ffff:999.1.2.3", None), ("::ffff:01.2.3.4", None),
        ("1:2:3:4:5:6:7:1.2.3.4", None),
    ]
    t = spark.createDataFrame([(c,) for c, _ in cases], "ip string")
    got = {r.ip: r.c for r in esql(
        spark, 'FROM d | EVAL c = TO_IP(ip)', tables={"d": t}).collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)


def test_to_ip_spark_and_duckdb_twins_agree(spark):
    """The generated Spark column and the generated DuckDB SQL implement
    the SAME algorithm — property-check them against each other on a
    seeded random address corpus."""
    import random

    import duckdb

    from elasticsearch_hbase_river_spark.functions.ip import (
        to_ip_col,
        to_ip_sql,
    )

    rng = random.Random(1234)
    cases = []
    for _ in range(150):
        n = rng.randint(1, 8)
        gs = [rng.choice(["0", "0000", "1", "00a", "ffff",
                          "%x" % rng.randint(0, 65535)]) for _ in range(n)]
        if n == 8:
            cases.append(":".join(gs))
        else:
            cut = rng.randint(0, n)
            cases.append(":".join(gs[:cut]) + "::" + ":".join(gs[cut:]))
    df = spark.createDataFrame([(c,) for c in cases], "ip string")
    got_spark = {r.ip: r.c for r in
                 df.select("ip", to_ip_col(F.col("ip")).alias("c"))
                 .collect()}
    con = duckdb.connect()
    for c in cases:
        got_duck = con.execute(
            "SELECT " + to_ip_sql("?"), [c]).fetchone()[0]
        assert got_spark[c] == got_duck, (c, got_spark[c], got_duck)


def test_extended_stats_aggregates(spark):
    """VARIANCE / SKEWNESS / KURTOSIS: population moments from raw power
    sums; TO_UNSIGNED_LONG folds out-of-range to null."""
    t = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
    got = esql(spark, 'FROM d | STATS var = VARIANCE(v), '
                      'sk = ROUND(SKEWNESS(v), 6), '
                      'ku = ROUND(KURTOSIS(v), 6)',
               tables={"d": t}).collect()[0]
    assert got.var == 1.25            # population variance of 1..4
    assert got.sk == 0.0              # symmetric
    assert got.ku == -1.36            # uniform-4 excess kurtosis
    row = esql(spark, 'ROW a = 5, b = -3 | EVAL ua = TO_UNSIGNED_LONG(a), '
                      'ub = TO_UNSIGNED_LONG(b)').first()
    assert int(row.ua) == 5 and row.ub is None


def test_extended_stats_cancellation_clamp(spark):
    """A constant-valued group with a huge mean cancels catastrophically
    in raw power sums: the M2_REL_EPS clamp must pin variance to exactly
    0 (so SQRT never goes NaN on a tiny negative) and skew/kurt to NULL,
    and the near-constant case (spread ~1e-6 of mean) must survive."""
    t = spark.createDataFrame(
        [("a", 1e9 + 0.25)] * 4
        + [("b", 1e6), ("b", 1e6 + 1.0), ("b", 1e6 + 2.0)],
        "g string, v double")
    got = {r.g: r for r in esql(
        spark, 'FROM d | STATS var = VARIANCE(v), '
               'sd = SQRT(VARIANCE(v)), '
               'sk = SKEWNESS(v), ku = KURTOSIS(v) BY g',
        tables={"d": t}).collect()}
    assert got["a"].var == 0.0
    assert got["a"].sd == 0.0
    assert got["a"].sk is None and got["a"].ku is None
    # genuine (tiny relative) spread is NOT clamped away
    assert abs(got["b"].var - 2.0 / 3.0) < 1e-3
    assert got["b"].sk is not None


def test_kql_bigint_term_exact_above_2_53(spark):
    """KQL term equality on an integral column compares in the column's
    own type: 9007199254740993 (2^53 + 1) must not match its double-
    rounded neighbors, and a non-integer value on an integer field is a
    positioned error."""
    big = 9007199254740993  # 2^53 + 1; float(big) == float(big - 1)
    t = spark.createDataFrame(
        [(1, big), (2, big - 1), (3, big + 1)], "id long, v long")

    def run(q):
        esc = q.replace('"', '\\"')
        return sorted(r.id for r in esql(
            spark, f'FROM d | WHERE KQL("{esc}") | KEEP id',
            tables={"d": t}).collect())

    assert run(f"v:{big}") == [1]
    assert run(f"v:{big - 1}") == [2]
    with pytest.raises(ESQLError, match="integer field"):
        run("v:4.5")


def test_kql_date_column_datetime_literal(spark):
    """A datetime literal against a DATE column must not silently
    truncate its time part: the column is promoted to timestamp
    (midnight) and compared against the full literal."""
    t = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03")],
        "id long, d string").selectExpr("id", "cast(d as date) as d")

    def run(q):
        esc = q.replace('"', '\\"')
        return sorted(r.id for r in esql(
            spark, f'FROM t | WHERE KQL("{esc}") | KEEP id',
            tables={"t": t}).collect())

    # midnight of 01-01 is before 10:00, so 01-01 must be EXCLUDED
    assert run('d > "2024-01-01 10:00"') == [2, 3]
    assert run('d <= "2024-01-02 10:00"') == [1, 2]
    # pure date literals keep date-typed comparison
    assert run("d > 2024-01-01") == [2, 3]
    assert run("d >= 2024-01-02") == [2, 3]


def test_cidr_match_cross_family(spark):
    """CIDR_MATCH runs on the 128-bit value with IPv4 mapped into
    ::ffff:0:0/96 (the Lucene InetAddressPoint encoding): v6 blocks,
    non-nibble-aligned prefixes, and the ES rule that a v4 block
    catches IPv4-mapped text forms. Invalid addresses never match."""
    rows = [(1, "10.1.2.3"), (2, "::ffff:10.9.9.9"), (3, "11.0.0.1"),
            (4, "2001:db8:1::5"), (5, "2001:db9::1"), (6, "fe80::1"),
            (7, "febf::1"), (8, "fec0::1"), (9, "not-an-ip"),
            (10, "10.999.1.1")]
    t = spark.createDataFrame(rows, "id long, ip string")

    def run(blocks):
        blks = ", ".join(f'"{b}"' for b in blocks)
        return sorted(r.id for r in esql(
            spark, f'FROM d | WHERE CIDR_MATCH(ip, {blks}) | KEEP id',
            tables={"d": t}).collect())

    assert run(["10.0.0.0/8"]) == [1, 2]          # mapped form included
    assert run(["2001:db8::/32"]) == [4]
    assert run(["fe80::/10"]) == [6, 7]           # partial-nibble prefix
    assert run(["10.0.0.0/8", "2001:db8::/32"]) == [1, 2, 4]
    assert run(["::/0"]) == [1, 2, 3, 4, 5, 6, 7, 8]  # v6 whole space
    with pytest.raises(ESQLError, match="bad CIDR block"):
        run(["10.0.0.0/33"])


def test_ip_hex32_spark_and_duckdb_twins_agree(spark):
    """ip_hex32 (the CIDR encoding) agrees between the Spark column and
    the generated DuckDB SQL on random v4/v6/mapped/garbage inputs."""
    import random

    import duckdb

    from elasticsearch_hbase_river_spark.functions.ip import (
        ip_hex32_col,
        ip_hex32_sql,
    )

    rng = random.Random(77)
    cases = ["10.1.2.3", "::ffff:1.2.3.4", "2001:db8::1", "junk",
             "10.999.0.1", "::", "::1.2.3.4"]
    for _ in range(80):
        n = rng.randint(1, 8)
        gs = ["%x" % rng.randint(0, 65535) for _ in range(n)]
        if n == 8:
            cases.append(":".join(gs))
        else:
            cut = rng.randint(0, n)
            cases.append(":".join(gs[:cut]) + "::" + ":".join(gs[cut:]))
    df = spark.createDataFrame([(c,) for c in cases], "ip string")
    got_spark = {r.ip: r.h for r in
                 df.select("ip", ip_hex32_col(F.col("ip")).alias("h"))
                 .collect()}
    con = duckdb.connect()
    for c in cases:
        got_duck = con.execute(
            "SELECT " + ip_hex32_sql("?"), [c]).fetchone()[0]
        assert got_spark[c] == got_duck, (c, got_spark[c], got_duck)


def test_qstr_phrases_and_or_groups(spark):
    """QSTR widening: quoted phrases (consecutive analyzed tokens) and
    parenthesized OR groups, composing with +/- and should semantics."""
    rows = [(1, "the quick brown fox"), (2, "brown quick the fox"),
            (3, "slow red fox"), (4, "quick dog")]
    t = spark.createDataFrame(rows, "id long, text string")

    def run(q):
        esc = q.replace('"', '\\"')
        return sorted(r.id for r in esql(
            spark, f'FROM d | WHERE QSTR("{esc}") | KEEP id',
            tables={"d": t}).collect())

    assert run('text:"quick brown"') == [1]        # adjacency, not AND
    assert run('+text:"quick brown fox"') == [1]
    assert run("text:(red OR dog)") == [3, 4]
    assert run("text:(bro* OR dog)") == [1, 2, 4]  # wildcard inside group
    assert run('+text:fox -text:"slow red"') == [1, 2]
    assert run('text:(quick OR slow) +text:fox') == [1, 2, 3]
    with pytest.raises(ESQLError, match="one token"):
        run("text:(quick brown OR fox)")
    with pytest.raises(ESQLError, match="empty quoted phrase"):
        run('text:""')
    with pytest.raises(ESQLError, match="must be \\(term OR term"):
        run("text:(quick)")


def test_spatial_holes_and_multipolygon(spark):
    """Shape literals widen to POLYGON-with-holes and MULTIPOLYGON:
    even-odd parity over all rings — a point in the hole is outside, a
    point in either disjoint part is inside."""
    donut = ('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), '
             '(4 4, 6 4, 6 6, 4 6, 4 4))')
    multi = 'MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))'
    rows = [(1, 2.0, 2.0),   # in donut body
            (2, 5.0, 5.0),   # in the hole -> outside donut, inside part 2
            (3, 1.0, 1.0),   # in multi part 1 + donut body
            (4, 11.0, 1.0)]  # outside everything
    t = spark.createDataFrame(rows, "id long, lon double, lat double")

    def run(shape):
        return sorted(r.id for r in esql(
            spark, f'FROM d | WHERE ST_INTERSECTS(ST_POINT(lon, lat), '
                   f'TO_GEOSHAPE("{shape}")) | KEEP id',
            tables={"d": t}).collect())

    assert run(donut) == [1, 3]
    assert run(multi) == [2, 3]
    # envelope spans every ring/part
    row = esql(spark, f'ROW x = 1 | EVAL e = ST_ENVELOPE(TO_GEOSHAPE("{multi}")) '
                      '| EVAL xr = ST_XMAX(e), yl = ST_YMIN(e)').first()
    assert row.xr == 7.0 and row.yl == 0.0
