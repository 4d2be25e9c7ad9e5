"""Unit tests for DSL-pack-5's driver-side pure functions. The queries
themselves are covered by the auto-parametrized oracle parity suite
(`test_oracle_parity.py`)."""

from __future__ import annotations

import pytest

from elasticsearch_hbase_river_spark.operators.esdsl5 import (
    MSEARCH,
    _parse_simple_query_string,
)


def test_parse_sqs_groups_and_negation():
    groups = _parse_simple_query_string("scan + merge | batch + -dup")
    assert groups == [(["scan", "merge"], []), (["batch"], ["dup"])]


def test_parse_sqs_single_group_all_positive():
    assert _parse_simple_query_string("a b c") == [(["a", "b", "c"], [])]


def test_parse_sqs_rejects_unsupported_syntax():
    with pytest.raises(ValueError):
        _parse_simple_query_string('scan "a phrase"')
    with pytest.raises(ValueError):
        _parse_simple_query_string("field:term | x")


def test_parse_sqs_rejects_negative_only_group():
    with pytest.raises(ValueError):
        _parse_simple_query_string("scan | -dup")


def test_msearch_query_ids_are_unique():
    qids = [q for q, _ in MSEARCH]
    terms = [t for _, t in MSEARCH]
    assert len(set(qids)) == len(qids)
    assert len(set(terms)) == len(terms)
