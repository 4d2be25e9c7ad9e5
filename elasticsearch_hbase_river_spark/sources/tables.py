"""Parquet table loaders for the driver-generated fixture tables.

The fixture ``events.ts`` column has changed physical type across fixture
regenerations — round 1 shipped parquet ``TIMESTAMP(NANOS)`` (which Spark
only reads under ``spark.sql.legacy.parquet.nanosAsLong`` as an epoch-nanos
``LongType``), round 2 regenerated it as ``TIMESTAMP(MICROS)`` isAdjustedToUTC=false
(Spark ``TIMESTAMP_NTZ``). The engine therefore branches on the dtype it
actually observes instead of assuming one physical layout:

=================  =======================================================
observed dtype      ``ts_ms`` derivation (exact integer math, no floats)
=================  =======================================================
``bigint``          ``ts div 1_000_000``  (epoch-nanos long)
``timestamp_ntz``   ``unix_millis(cast(ts as timestamp))`` under a pinned
                    UTC session timezone — the NTZ wall-clock is read as
                    UTC, matching DuckDB's ``epoch_ms(ts)`` on the same file
``timestamp``       ``unix_millis(ts)``
=================  =======================================================

Any other dtype fails fast with a one-line message naming what was found
(the driver has regenerated the fixture once already; when it happens again
the error should be one clear line, not 23 stack traces).

``spark.sql.session.timeZone`` is pinned to UTC: oracle parity of every
``ts_ms`` value depends on it for the NTZ path, and it must not silently
inherit the sandbox's timezone.
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

NANOS_PER_MILLI = 1_000_000

#: events.ts dtypes the engine knows how to ingest (see module docstring).
SUPPORTED_TS_DTYPES = ("bigint", "timestamp_ntz", "timestamp")

#: Columns every operator assumes per fixture table. Checked by NAME only —
#: physical types are allowed to drift (the engine adapts where it must,
#: see the ts story above; a type-strict check here would turn benign
#:  regenerations into 100 red queries). A missing column fails the FIRST
#: load with one clear line instead of a stack trace per query.
EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name", "p_type", "p_size"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                 "l_linestatus", "l_shipdate"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


_INFER_FROM_GENERATE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def _tune_session(spark: SparkSession) -> None:
    """Runtime confs the engine needs regardless of who built the session.

    - ``session.timeZone=UTC``: load-bearing for ``ts_ms`` parity on the
      TIMESTAMP_NTZ fixture path (module docstring).
    - ``nanosAsLong``: lets the TIMESTAMP(NANOS) fixture variant load at
      all; a no-op for micros/millis parquet timestamps.
    - exclude ``InferFiltersFromGenerate``: the rule infers ``size(g) > 0``
      below every ``explode``, and predicate pushdown then substitutes the
      generator's full expression into that filter — for computed arrays
      (shingles, minhash bands) the whole higher-order-function expression
      is re-evaluated per input row, measured 8x slower at sf0.1
      (SPARK-36715 pathology). ``explode`` already drops empty/null arrays,
      so excluding the rule is semantics-preserving.
    - ``codegen.hugeMethodLimit=8000``: align whole-stage codegen's
      fallback with HotSpot's JIT compile ceiling (the default
      ``-XX:DontCompileHugeMethods`` threshold is 8000 bytecode bytes —
      a JVM property, independent of data scale). Spark's default limit
      (65535) happily fuses expression-heavy stages into one giant
      method that the JIT then REFUSES to compile, so the hot loop runs
      in the bytecode interpreter; at 8000 such stages fall back to
      per-operator codegen whose smaller methods all JIT. Measured on
      the staged IP-parse chain: q_esql_cidr6 ~4.8 -> ~3.3 s,
      q_esql_to_ip6 ~2.0 -> ~1.2 s warm; neutral-to-better across an
      18-query mixed battery (r11 A/B).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    current = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    if not current:
        spark.conf.set("spark.sql.optimizer.excludedRules", _INFER_FROM_GENERATE)
    elif _INFER_FROM_GENERATE not in current:
        spark.conf.set("spark.sql.optimizer.excludedRules",
                       f"{current},{_INFER_FROM_GENERATE}")


def events_ts_dtype(ev: DataFrame) -> str:
    """The observed dtype of ``events.ts``, validated against the supported
    variants. Schema-only — never triggers a job."""
    dtype = dict(ev.dtypes).get("ts")
    if dtype not in SUPPORTED_TS_DTYPES:
        raise TypeError(
            f"events.ts has unsupported dtype {dtype!r}; the engine supports "
            f"{SUPPORTED_TS_DTYPES} — the fixture was likely regenerated "
            "with a new physical timestamp layout (sources/tables.py)."
        )
    return dtype


def ts_ms_col(ev: DataFrame) -> Column:
    """Epoch-millis column derived from ``events.ts``, whatever its physical
    type (module docstring table). Exact integer math in every branch."""
    dtype = events_ts_dtype(ev)
    if dtype == "bigint":
        return F.expr(f"ts div {NANOS_PER_MILLI}")
    if dtype == "timestamp_ntz":
        # NTZ wall-clock read as UTC (session TZ pinned by _tune_session).
        return F.unix_millis(F.col("ts").cast("timestamp"))
    return F.unix_millis(F.col("ts"))


def ts_watermark_pred(ev: DataFrame, min_ts_ms_exclusive: int) -> Column:
    """Pushdown-friendly incremental-scan predicate: ``ts_ms > wm``
    expressed on the RAW ``ts`` column against a foldable literal, so it
    reaches the parquet scan (PushedFilters) instead of filtering after the
    ``ts_ms`` derivation. ``ts_ms > wm  <=>  ts >= wm+1 ms`` for the
    floor-division/unix_millis derivations (non-negative ts)."""
    wm1 = min_ts_ms_exclusive + 1
    dtype = events_ts_dtype(ev)
    if dtype == "bigint":
        return F.col("ts") >= wm1 * NANOS_PER_MILLI
    if dtype == "timestamp_ntz":
        # timestamp_millis() is LTZ; the cast to NTZ is UTC wall-clock under
        # the pinned session TZ. Fully foldable -> stays in PushedFilters.
        return F.col("ts") >= F.expr(
            f"cast(timestamp_millis({wm1}) as timestamp_ntz)")
    return F.col("ts") >= F.expr(f"timestamp_millis({wm1})")


#: Per-session cache of the LAZY base relations, keyed (sf_dir, name).
#: ``spark.read.parquet`` on a bare path builds a fresh InMemoryFileIndex
#: and re-reads the parquet footer for schema inference on EVERY call —
#: measured 140-400 ms each, and one full registry construction makes ~390
#: ``load_table`` calls (≈60-100 s of pure repeated metadata work per
#: bench). Caching the resulting DataFrame caches ONLY the unresolved
#: relation — file listing + schema, the same metadata Spark itself caches
#: for catalog tables (guide §6 file-listing cache); no data, no results,
#: every action still computes from the parquet files. WeakKeyDictionary:
#: entries die with their session, so a stopped session never serves a
#: stale JVM handle.
_TABLE_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fanout: bool = False) -> DataFrame:
    """Read one fixture table; column pruning/pushdown stays with Catalyst.

    ``fanout=True`` inserts a round-robin repartition to defaultParallelism
    for CPU-heavy map-side consumers stuck behind the fixtures'
    single-row-group layout (one scan task). Catalyst pushes filters and
    pruning THROUGH the repartition, so pushdown-sensitive plans keep their
    PushedFilters. Measured at sf0.1 this is a wash-to-loss for ordinary
    scan→partial-agg queries (their cost is planning/codegen, and the extra
    exchange + sort-before-repartition adds more than it buys), so it is
    OFF by default and opt-in per operator.

    The fanout is SCALE-ADAPTIVE (r11, guide §2.5 input skew — same gate
    as the ES|QL compiler's IP-parse fanout): the repartition is added
    only when the scan's own parallelism is below the session's, i.e.
    exactly the single-row-group-fixture case it exists for. At real
    scale the scan already has >= cores partitions and NO exchange is
    added — the old unconditional form would have SHRUNK a 1000-split
    scan to the local core count. The partition count is plan-time
    metadata (no job), cached per session next to the relation.
    """
    per_session = _TABLE_CACHE.setdefault(spark, {})
    df = per_session.get((sf_dir, name))
    if df is None:
        _tune_session(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        expected = EXPECTED_COLUMNS.get(name, set())
        missing = expected - set(df.columns)
        if missing:
            raise TypeError(
                f"fixture table {name!r} at {sf_dir} is missing expected "
                f"column(s) {sorted(missing)} (found {sorted(df.columns)}) "
                "— the fixture was likely regenerated with a new schema "
                "(sources/tables.py:EXPECTED_COLUMNS)."
            )
        per_session[(sf_dir, name)] = df
    if fanout:
        par = spark.sparkContext.defaultParallelism
        nparts = per_session.get((sf_dir, name, "nparts"))
        if nparts is None:
            # NOT free: getNumPartitions on a DataFrame RDD triggers full
            # physical planning plus a javaToPython conversion (~100 ms,
            # no job) — hence the per-table cache. The cached count can
            # go stale if split-packing conf (maxPartitionBytes /
            # openCostInBytes) changes mid-session; acceptable because
            # the engine never changes those at runtime and the gate
            # only decides whether to ADD parallelism (a stale "1" adds
            # a redundant-but-harmless exchange, never drops one).
            nparts = df.rdd.getNumPartitions()
            per_session[(sf_dir, name, "nparts")] = nparts
        if nparts < par:
            df = df.repartition(par)
    return df


#: Per-session cache of lazy relations over PUBLISHED index directories.
#: Same metadata-only rationale as :data:`_TABLE_CACHE` (file listing +
#: schema, never data); the extra contract here is IMMUTABILITY — index
#: layouts publish via tmp + atomic rename and are never appended to, so
#: a cached listing can never go stale. Epochs/stream directories GAIN
#: files between reads and must never go through this (their readers in
#: river_stream.py/nesteddoc.py call spark.read.parquet directly).
_IMMUTABLE_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def read_immutable(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` for a published, immutable index dataset,
    cached per (session, path). A bare-path read re-lists the directory
    and re-reads footers for schema inference on every call (~80-140 ms
    for the 32-bucket sidecar layouts); indexed queries make 2-4 such
    reads each, ~100 queries per bench."""
    per_session = _IMMUTABLE_CACHE.setdefault(spark, {})
    df = per_session.get(path)
    if df is None:
        df = spark.read.parquet(path)
        per_session[path] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with a derived epoch-millis ``ts_ms`` (schema-adaptive)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_ms", ts_ms_col(ev))
