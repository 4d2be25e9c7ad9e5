"""Bucketed co-located join: the join must plan with zero Exchange nodes."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.sources.bucketing import (
    read_bucketed, write_bucketed,
)
from elasticsearch_hbase_river_spark.sources.tables import load_events


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # managed tables land in the session's default warehouse; DROP TABLE
    # in the finally block removes the files (warehouse.dir is static
    # config and cannot be pointed at tmp_path at runtime)
    ev = load_events(spark, sf_dir)
    left = ev.select("user_id", "event_id", "event_type")
    right = (ev.groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n_events")))
    write_bucketed(left, "b_left", "user_id", n_buckets=8)
    write_bucketed(right, "b_right", "user_id", n_buckets=8)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffled-join path (the case bucketing exists for —
        # at scale neither fact side is broadcastable)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_bucketed(spark, "b_left").join(
            read_bucketed(spark, "b_right"), "user_id")
        # co-located: both sides pre-bucketed on the key -> no shuffle
        assert "Exchange hashpartitioning" not in _plan(j)
        assert "SortMergeJoin" in _plan(j)
        # and the join result is correct
        assert j.count() == left.count()
        assert j.filter(F.col("n_events") < 1).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_aggregation_reuses_layout(spark, sf_dir):
    """A groupBy on the bucket key must also run shuffle-free."""
    ev = load_events(spark, sf_dir).select("user_id", "value")
    write_bucketed(ev, "b_agg", "user_id", n_buckets=8)
    try:
        agg = (read_bucketed(spark, "b_agg")
               .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
        assert "Exchange" not in _plan(agg)
        assert agg.count() == ev.select("user_id").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")


def test_python_xxh64_matches_spark(spark, sf_dir):
    """The driver-side bucket planner (functions/xxh64.py) must agree with
    Spark's xxhash64 BIT-FOR-BIT — it decides which postings/vocab bucket
    directories a term query reads, so one divergent hash silently drops a
    term's postings. Covers the whole fixture vocabulary plus adversarial
    lengths 0..40 (every XXH64 tail path: 8-byte words, 4-byte chunk,
    byte loop, and the >=32 lane path) and multi-byte UTF-8."""
    import random
    import string

    from elasticsearch_hbase_river_spark.functions.xxh64 import (
        pmod_bucket, xxhash64_str,
    )
    from elasticsearch_hbase_river_spark.operators.indexed_search import (
        N_BUCKETS, _terms_buckets,
    )

    vocab = [r[0] for r in
             spark.read.parquet(f"{sf_dir}/documents.parquet")
             .select(F.explode(F.split("text", " ")).alias("t"))
             .distinct().collect()]
    rng = random.Random(1234)
    samples = vocab + ["", "a", "ab", "abc", "abcd", "x" * 100] + [
        "".join(rng.choices(string.ascii_lowercase + "éü∂% ", k=k))
        for k in range(1, 41)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    rows = df.select(
        "t", F.xxhash64("t").alias("h"),
        F.pmod(F.xxhash64("t"), F.lit(N_BUCKETS)).alias("b")).collect()
    for r in rows:
        assert xxhash64_str(r.t) == r.h, repr(r.t)
        assert pmod_bucket(r.t, N_BUCKETS) == r.b, repr(r.t)
    # the planner helper agrees with a Spark-side computation of the same
    assert _terms_buckets(tuple(vocab)) == sorted({r.b for r in rows[:len(vocab)]})

    # long twin (doc-bucket pruning for the forward index / doclen)
    from elasticsearch_hbase_river_spark.functions.xxh64 import (
        pmod_bucket_long, xxhash64_long,
    )

    lvals = [0, 1, -1, 7, 123_456_789, -987_654_321, 2**62, -(2**62),
             2**63 - 1, -(2**63)]
    ldf = spark.createDataFrame([(v,) for v in lvals], "v long")
    for r in ldf.select(
            "v", F.xxhash64("v").alias("h"),
            F.pmod(F.xxhash64("v"), F.lit(N_BUCKETS)).alias("b")).collect():
        assert xxhash64_long(r.v) == r.h, r.v
        assert pmod_bucket_long(r.v, N_BUCKETS) == r.b, r.v


def test_delete_neighborhood_python_twin_matches_spark_expr(spark):
    """The driver-side delete-≤2 neighborhood (query rewrite) and the
    Spark-side _VKEYS_EXPR (sidecar build) must generate IDENTICAL key
    sets — a divergence silently drops fuzzy candidates (pruned buckets
    that are never probed)."""
    from elasticsearch_hbase_river_spark.operators.indexed_search import (
        _VKEYS_EXPR, delete_neighborhood,
    )

    tokens = ["spark", "a", "ab", "aaa", "x9z", "0", "sparkly",
              "mississippi", "zz9pluralzalpha"]
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    got = {r["token"]: sorted(r["keys"])
           for r in df.select("token",
                              F.expr(_VKEYS_EXPR).alias("keys")).collect()}
    for t in tokens:
        assert got[t] == delete_neighborhood(t, max_dist=2), t
        # the d=1 slice of the sidecar (depth = length difference <= 1)
        # is exactly the delete-1 neighborhood the d=1 rewrite probes
        d1 = sorted(k for k in got[t] if len(t) - len(k) <= 1)
        assert d1 == delete_neighborhood(t, max_dist=1), t


def test_symspell_d2_candidates_cover_edit_ball():
    """SymSpell's d=2 guarantee, checked constructively: for edits of each
    kind (sub/ins/del ×2, mixed), the delete-≤2 neighborhoods of the
    original and the edited term intersect — the pruned rewrite can never
    MISS a true distance-≤2 vocabulary term."""
    from elasticsearch_hbase_river_spark.operators.indexed_search import (
        delete_neighborhood,
    )

    base = "stream"
    variants = [
        "stream", "strea", "stra", "streams", "streamss", "xtream",
        "xtreax", "sream", "streamx", "tream", "ream", "setream",
        "streaming"[:8], "sxtream",
    ]
    nb = set(delete_neighborhood(base, 2))
    for v in variants:
        lev = _levenshtein(base, v)
        if lev <= 2:
            assert nb & set(delete_neighborhood(v, 2)), (v, lev)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
