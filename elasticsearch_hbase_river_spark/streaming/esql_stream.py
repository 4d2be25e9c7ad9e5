"""Streaming ES|QL: a continuously-maintained materialized ES|QL result.

The reference's whole loop is "poll the changefeed on a timer, transform,
publish" (`HBaseRiver.java:263` drives the tick); `streaming/river_stream.py`
re-expresses that loop as Structured Streaming. This module puts the ES|QL
language on top of the same tick: one pipeline text, compiled once, whose
stateless prefix runs ON THE STREAMING RELATION itself (pinning that the
compiler emits stream-capable plans) and whose ``STATS`` is maintained
incrementally across micro-batches.

Two maintenance modes, chosen automatically from the query:

- **mergeable** (the scale path): every aggregate in ``STATS`` is
  COUNT / SUM / MIN / MAX / AVG / WEIGHTED_AVG (scalar wrappers like
  ``ROUND(SUM(x), 4)``
  and per-aggregate ``WHERE`` filters allowed). Each micro-batch computes
  the batch's PARTIAL aggregates — one |groups|-sized relation — and
  overwrites ``partials/epoch=<batch_id>`` (idempotent on retry, the same
  exactly-once-per-epoch discipline as ``start_index_stream``). Reading the
  result merges partials with the algebraic combine (sum of sums, sum of
  counts, min of mins; AVG = merged sum / merged count) and then evaluates
  the original wrapper expressions over the merged columns. Per-tick work
  is O(batch), read-time work is O(epochs x groups) — rows are never
  rescanned, which is what makes the view maintainable against a 100 TB
  feed.
- **recompute** (the honest fallback): a non-decomposable aggregate
  (MEDIAN, PERCENTILE, COUNT_DISTINCT, VALUES, TOP, STD_DEV) stores the
  prefix-transformed rows per epoch and re-runs the ``STATS`` over the
  accumulated rows at read time. Still exactly-once, but read cost grows
  with history — the mode is surfaced on the plan so callers can see which
  contract they bought.

Commands after ``STATS`` (SORT / LIMIT / KEEP / DROP / RENAME / EVAL /
WHERE) act on the |groups|-sized aggregate relation and are applied at
read time by the same compiler.

State poisoning guard: the state dir is stamped with the query text's
fingerprint; a tick or read against a different query refuses loudly
instead of silently merging incompatible partials.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.esql import (
    DEFAULT_POLICIES,
    ESQLError,
    _AGGS,
    _Compiler,
    parse,
)

#: aggregates with an algebraic partial/combine decomposition
#: (AVG = sum+count pair; WEIGHTED_AVG = sum(x*w)+sum(w) pair)
MERGEABLE_AGGS = frozenset({"COUNT", "SUM", "MIN", "MAX", "AVG",
                            "WEIGHTED_AVG"})

#: per-row commands the compiler can bind to a streaming relation
#: (LOOKUP JOIN / ENRICH are stream-static joins — the lookup side is a
#: batch dimension table, which Structured Streaming supports natively)
_PREFIX_OK = frozenset({"WHERE", "EVAL", "RENAME", "KEEP", "DROP",
                        "MV_EXPAND", "DISSECT", "GROK", "SAMPLE",
                        "LOOKUP", "ENRICH"})

#: commands that operate on the (small) aggregate relation at read time
_SUFFIX_OK = frozenset({"WHERE", "EVAL", "SORT", "LIMIT", "KEEP", "DROP",
                        "RENAME"})

_META = "_esql_stream_meta.json"


def _query_sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()[:16]


def _split_agg_calls(ast, sink: list, spec_ix: int):
    """Replace every aggregate call in ``ast`` with a placeholder field
    reference ``__a<spec>_<k>`` and append the original call to ``sink`` —
    the wrapper expression is then re-evaluable over merged partials."""
    if isinstance(ast, tuple):
        if ast[0] == "call" and ast[1] in _AGGS:
            sink.append(ast)
            return ("field", f"__a{spec_ix}_{len(sink) - 1}")
        return tuple(
            _split_agg_calls(x, sink, spec_ix)
            if isinstance(x, (tuple, list)) else x
            for x in ast)
    if isinstance(ast, list):
        return [_split_agg_calls(x, sink, spec_ix)
                if isinstance(x, (tuple, list)) else x for x in ast]
    return ast


def plan_esql_stream(text: str) -> dict:
    """Validate and split the pipeline for streaming maintenance.

    Returns ``{"cmds", "stats_at", "specs", "mergeable", "key_names"}``
    where each spec is ``(out_name, final_ast, agg_calls, cond_ast)``.
    """
    cmds = parse(text)
    if cmds[0]["cmd"] != "FROM":
        raise ESQLError("streaming ES|QL needs a FROM <stream> head", 0,
                        text)
    if len(cmds[0].get("tables", [cmds[0]["table"]])) > 1:
        raise ESQLError("streaming ES|QL binds exactly one stream — "
                        "multi-index FROM is batch-only",
                        cmds[0]["pos"], text)
    stats_ix = [i for i, c in enumerate(cmds) if c["cmd"] == "STATS"]
    if len(stats_ix) != 1:
        raise ESQLError(
            "streaming ES|QL maintains exactly one STATS (got "
            f"{len(stats_ix)})", cmds[0]["pos"], text)
    at = stats_ix[0]
    for c in cmds[1:at]:
        if c["cmd"] not in _PREFIX_OK:
            raise ESQLError(
                f"{c['cmd']} is not streamable before STATS in this "
                "subset", c["pos"], text)
    for c in cmds[at + 1:]:
        if c["cmd"] not in _SUFFIX_OK:
            raise ESQLError(
                f"{c['cmd']} is not supported after STATS in the "
                "streaming subset", c["pos"], text)
    stats = cmds[at]
    specs = []
    mergeable = True
    for si, (name, e, cond) in enumerate(stats["aggs"]):
        calls: list = []
        final_ast = _split_agg_calls(e, calls, si)
        if not calls:
            raise ESQLError(f"STATS column {name!r} contains no aggregate",
                            stats["pos"], text)
        if any(c[1] not in MERGEABLE_AGGS for c in calls):
            mergeable = False
        specs.append((name or _Compiler._default_name(e), final_ast,
                      calls, cond))
    key_names = [name or _Compiler._default_name(e)
                 for name, e in stats["by"]]
    return {"cmds": cmds, "stats_at": at, "specs": specs,
            "mergeable": mergeable, "key_names": key_names}


def _stamp_state(state_dir: str, text: str, mode: str) -> None:
    marker = os.path.join(state_dir, _META)
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("query_sha") != _query_sha(text):
            raise ValueError(
                f"esql stream state at {state_dir} was built for a "
                "DIFFERENT query (sha "
                f"{meta.get('query_sha')} != {_query_sha(text)}); refusing "
                "to merge incompatible partials")
        return
    if os.path.isdir(state_dir) and any(
            n for n in os.listdir(state_dir) if not n.startswith("_")):
        raise ValueError(
            f"{state_dir} is non-empty but carries no esql-stream marker; "
            "refusing a foreign layout")
    os.makedirs(state_dir, exist_ok=True)
    with open(marker, "w") as f:
        json.dump({"query_sha": _query_sha(text), "mode": mode,
                   "text": text}, f)


def _check_state(state_dir: str, text: str) -> None:
    marker = os.path.join(state_dir, _META)
    if not os.path.exists(marker):
        raise ValueError(f"{state_dir} carries no esql-stream marker")
    with open(marker) as f:
        meta = json.load(f)
    if meta.get("query_sha") != _query_sha(text):
        raise ValueError(
            f"esql stream state at {state_dir} belongs to a different "
            "query; refusing")


def _partial_agg(comp: _Compiler, df: DataFrame, plan: dict) -> DataFrame:
    """The batch's partial aggregates: one row per group, columns
    ``__p<spec>_<k>`` (AVG contributes ``_s`` / ``_n`` sum+count pairs)."""
    stats = plan["cmds"][plan["stats_at"]]
    cols = df.columns
    keys = [comp.col(e, cols).alias(name or _Compiler._default_name(e))
            for name, e in stats["by"]]
    pcols: list[Column] = []
    for si, (_oname, _fast, calls, cond) in enumerate(plan["specs"]):
        condc = comp.col(cond, cols) if cond is not None else None
        for ci, call in enumerate(calls):
            agg = call[1]
            args = [comp.col(a, cols) for a in call[2] if a[0] != "star"]
            p = f"__p{si}_{ci}"
            if agg == "WEIGHTED_AVG":
                xw, w = args[0] * args[1], args[1]
                if condc is not None:
                    xw, w = F.when(condc, xw), F.when(condc, w)
                pcols.append(F.sum(xw).alias(p + "_s"))
                pcols.append(F.sum(w).alias(p + "_w"))
                continue
            arg = args[0] if args else F.lit(1)
            if condc is not None:
                arg = F.when(condc, arg)
            if agg == "COUNT":
                pcols.append(F.count(arg).cast("long").alias(p))
            elif agg == "SUM":
                pcols.append(F.sum(arg).alias(p))
            elif agg == "MIN":
                pcols.append(F.min(arg).alias(p))
            elif agg == "MAX":
                pcols.append(F.max(arg).alias(p))
            else:  # AVG: sum+count pair, finalized at merge
                pcols.append(F.sum(arg).alias(p + "_s"))
                pcols.append(F.count(arg).cast("long").alias(p + "_n"))
    return df.groupBy(*keys).agg(*pcols) if keys else df.agg(*pcols)


def start_esql_stream(spark: SparkSession, text: str, stream_df: DataFrame,
                      state_dir: str, checkpoint_dir: str, *,
                      sf_dir: Optional[str] = None,
                      tables: Optional[dict[str, DataFrame]] = None,
                      available_now: bool = True):
    """Maintain the ES|QL query over a streaming relation.

    ``stream_df`` binds the pipeline's ``FROM`` head. The stateless prefix
    is compiled onto the STREAMING DataFrame itself — the same plans the
    batch path emits, proving they are stream-capable — and each
    micro-batch lands its partials (or rows, in recompute mode) under
    ``state_dir`` keyed by batch_id, idempotent on retry."""
    plan = plan_esql_stream(text)
    mode = "mergeable" if plan["mergeable"] else "recompute"
    _stamp_state(state_dir, text, mode)
    head = plan["cmds"][0]["table"]
    bound = dict(tables or {})
    bound[head] = stream_df
    comp = _Compiler(spark, sf_dir, bound, DEFAULT_POLICIES, text)
    df = stream_df
    for c in plan["cmds"][1:plan["stats_at"]]:
        df = comp.apply(df, c)
    sub = "partials" if plan["mergeable"] else "rows"

    def tick(batch_df: DataFrame, batch_id: int) -> None:
        _check_state(state_dir, text)
        bcomp = _Compiler(batch_df.sparkSession, sf_dir, bound,
                          DEFAULT_POLICIES, text)
        out = (_partial_agg(bcomp, batch_df, plan) if plan["mergeable"]
               else batch_df)
        out.write.mode("overwrite").parquet(
            f"{state_dir}/{sub}/epoch={batch_id}")

    writer = (df.writeStream.foreachBatch(tick)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_esql_stream_result(spark: SparkSession, text: str,
                            state_dir: str) -> DataFrame:
    """Serve the maintained result: merge partials (or recompute), then
    apply the post-STATS commands. Pure DataFrame plan — nothing runs."""
    plan = plan_esql_stream(text)
    _check_state(state_dir, text)
    stats = plan["cmds"][plan["stats_at"]]
    comp = _Compiler(spark, None, {}, DEFAULT_POLICIES, text)
    keys = plan["key_names"]
    if plan["mergeable"]:
        part = spark.read.parquet(f"{state_dir}/partials").drop("epoch")
        mcols: list[Column] = []
        for si, (_oname, _fast, calls, _cond) in enumerate(plan["specs"]):
            for ci, call in enumerate(calls):
                agg, p = call[1], f"__p{si}_{ci}"
                if agg == "COUNT":
                    mcols.append(F.sum(p).cast("long").alias(p))
                elif agg in ("SUM",):
                    mcols.append(F.sum(p).alias(p))
                elif agg == "MIN":
                    mcols.append(F.min(p).alias(p))
                elif agg == "MAX":
                    mcols.append(F.max(p).alias(p))
                elif agg == "WEIGHTED_AVG":
                    mcols.append(F.sum(p + "_s").alias(p + "_s"))
                    mcols.append(F.sum(p + "_w").alias(p + "_w"))
                else:  # AVG
                    mcols.append(F.sum(p + "_s").alias(p + "_s"))
                    mcols.append(
                        F.sum(p + "_n").cast("long").alias(p + "_n"))
        merged = (part.groupBy(*keys).agg(*mcols) if keys
                  else part.agg(*mcols))
        # placeholder columns __a<spec>_<k>, then the wrapper expressions
        ph_cols = [F.col(k) for k in keys]
        for si, (_oname, _fast, calls, _cond) in enumerate(plan["specs"]):
            for ci, call in enumerate(calls):
                agg, p = call[1], f"__p{si}_{ci}"
                a = f"__a{si}_{ci}"
                if agg == "AVG":
                    ph_cols.append(
                        F.when(F.col(p + "_n") > 0,
                               F.col(p + "_s").cast("double")
                               / F.col(p + "_n")).alias(a))
                elif agg == "WEIGHTED_AVG":
                    # same expression shape as the batch aggregate
                    # (sum(x*w)/sum(w)) so null/zero semantics match
                    ph_cols.append(
                        (F.col(p + "_s") / F.col(p + "_w")).alias(a))
                else:
                    ph_cols.append(F.col(p).alias(a))
        ph = merged.select(*ph_cols)
        out = [F.col(k) for k in keys]
        for _si, (oname, fast, _calls, _cond) in enumerate(plan["specs"]):
            out.append(comp.col(fast, ph.columns).alias(oname))
        df = ph.select(*out)
    else:
        rows = spark.read.parquet(f"{state_dir}/rows").drop("epoch")
        df = comp.apply(rows, stats)
    for c in plan["cmds"][plan["stats_at"] + 1:]:
        df = comp.apply(df, c)
    return df
