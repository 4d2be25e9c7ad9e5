"""Schema-adaptive ``events.ts`` ingestion (sources/tables.py).

The driver regenerated the events fixture once already (round 1: parquet
TIMESTAMP(NANOS) → round 2: TIMESTAMP(MICROS) NTZ), which broke every
ts-consuming query. These tests pin the contract: identical ``ts_ms``
values out of every supported physical layout, a pushdown-surviving
watermark predicate on each, and a one-line failure for unsupported types.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.sources.tables import (
    events_ts_dtype,
    ts_ms_col,
    ts_watermark_pred,
)

#: epoch-millis test points: cold start, one fixture-era value, max ordering
TS_MS = [0, 1_705_367_014_557, 1_705_367_014_558, 1_800_000_000_123]


def _write(tmp_path, name: str, arrow_type, values):
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(
        pa.table({"id": list(range(len(values))),
                  "ts": pa.array(values, type=arrow_type)}), p)
    return p


@pytest.fixture(scope="module")
def variants(spark, tmp_path_factory):
    """The same four instants in each physical layout the engine supports."""
    tmp = tmp_path_factory.mktemp("ts_variants")
    return {
        "bigint": _write(tmp, "nanos_long", pa.int64(),
                         [ms * 1_000_000 for ms in TS_MS]),
        "timestamp_ntz": _write(tmp, "micros_ntz", pa.timestamp("us"),
                                [ms * 1_000 for ms in TS_MS]),
        "timestamp": _write(tmp, "micros_utc", pa.timestamp("us", tz="UTC"),
                            [ms * 1_000 for ms in TS_MS]),
    }


def _load(spark, path):
    # same runtime confs the engine sets (nanosAsLong, UTC session TZ)
    from elasticsearch_hbase_river_spark.sources.tables import _tune_session
    _tune_session(spark)
    return spark.read.parquet(path)


@pytest.mark.parametrize("dtype", ["bigint", "timestamp_ntz", "timestamp"])
def test_ts_ms_identical_across_layouts(spark, variants, dtype):
    df = _load(spark, variants[dtype])
    assert events_ts_dtype(df) == dtype
    got = dict(df.select("id", ts_ms_col(df).alias("ts_ms")).collect())
    assert got == dict(enumerate(TS_MS))


@pytest.mark.parametrize("dtype", ["bigint", "timestamp_ntz", "timestamp"])
def test_watermark_pred_matches_derived_filter(spark, variants, dtype):
    wm = TS_MS[1]  # strictly-greater watermark between two adjacent instants
    df = _load(spark, variants[dtype])
    via_raw = df.filter(ts_watermark_pred(df, wm))
    kept = sorted(r.id for r in via_raw.select("id").collect())
    want = [i for i, ms in enumerate(TS_MS) if ms > wm]
    assert kept == want


@pytest.mark.parametrize("dtype", ["timestamp_ntz", "timestamp"])
def test_watermark_pred_reaches_parquet_scan(spark, variants, dtype):
    """The raw-ts predicate must stay a foldable comparison that survives
    into the parquet scan's PushedFilters — not a post-derivation filter."""
    df = _load(spark, variants[dtype])
    plan = (df.filter(ts_watermark_pred(df, TS_MS[1]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(ts" in plan


def test_unsupported_dtype_fails_with_one_clear_line(spark):
    df = spark.range(1).select(F.col("id"), F.lit("oops").alias("ts"))
    with pytest.raises(TypeError, match="unsupported dtype 'string'"):
        events_ts_dtype(df)


def test_missing_ts_column_fails_clearly(spark):
    df = spark.range(1)
    with pytest.raises(TypeError, match="unsupported dtype None"):
        events_ts_dtype(df)


def test_all_fixture_tables_satisfy_column_contract(spark, sf_dir):
    """Every fixture table loads under the name-only column contract."""
    from elasticsearch_hbase_river_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t)  # raises on a missing expected column


def test_missing_column_fails_with_one_clear_line(spark, tmp_path):
    """A regenerated fixture dropping an expected column must produce ONE
    clear error at load, not a stack trace per downstream query."""
    from elasticsearch_hbase_river_spark.sources.tables import load_table

    pq.write_table(pa.table({"r_regionkey": [0]}), str(tmp_path / "region.parquet"))
    with pytest.raises(TypeError, match=r"missing expected column\(s\) \['r_name'\]"):
        load_table(spark, str(tmp_path), "region")
