"""Every registered query with an oracle twin must match DuckDB at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01) so regressions are
caught locally first.
"""

from __future__ import annotations

import pytest

from elasticsearch_hbase_river_spark.registry import all_oracles, all_queries
from tests.oracle_harness import compare

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    """Weaker check for non-SQL-expressible ops: runs and yields a schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0
