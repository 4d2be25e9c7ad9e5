"""Unit tests for DSL-pack-4's driver-side pure functions. The queries
themselves are covered by the auto-parametrized oracle parity suite
(`test_oracle_parity.py`)."""

from __future__ import annotations

import pytest

from elasticsearch_hbase_river_spark.operators.esdsl4 import (
    _parse_query_string,
    _range_label,
)


def test_parse_query_string_clauses():
    must, must_not, should = _parse_query_string("+value -spark merge batch")
    assert must == ["value"]
    assert must_not == ["spark"]
    assert should == ["merge", "batch"]


def test_parse_query_string_all_bare_is_should():
    must, must_not, should = _parse_query_string("a b c")
    assert (must, must_not) == ([], [])
    assert should == ["a", "b", "c"]


def test_parse_query_string_rejects_unsupported_syntax():
    with pytest.raises(ValueError):
        _parse_query_string('+ok "phrase here"')
    with pytest.raises(ValueError):
        _parse_query_string("field:term")


def test_range_labels_are_es_style():
    assert _range_label((25.0, 50.0, 75.0)) == [
        "*-25.0", "25.0-50.0", "50.0-75.0", "75.0-*"]
