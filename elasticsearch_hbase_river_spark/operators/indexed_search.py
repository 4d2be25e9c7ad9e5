"""Materialized (persistent) search index — the reference's actual product.

The reference's entire purpose is maintaining a PERSISTENT Elasticsearch
index alongside the source table (`HBaseParser.java:135-162` builds and
ships the index documents; the river never re-derives the index per query).
`operators/search.py` proves the query semantics but rebuilds postings from
the corpus on every call; this module materializes the index ONCE and makes
term queries read it — the ES-native separation of index build from query.

Layout (a directory, portable parquet — no session catalog needed, so the
index survives across SparkSessions and processes, unlike an in-memory-
catalog bucketed table):

- ``postings/tbucket=<0..31>/`` — (token, doc_id, tf, first_pos, positions),
  hash-partitioned on ``pmod(xxhash64(token), 32)``. A term query computes
  its terms' buckets (one local job over the literal terms) and reads ONLY
  those directories — storage-level partition pruning is the postings-list
  seek of a real inverted index. At 100 TB: more buckets (4096) and many
  files per bucket; the pruning ratio is what matters.
- ``vocab/`` — (token, df, freq): document frequency + total term
  frequency. The vocabulary is orders of magnitude smaller than the corpus;
  fuzzy expansion and completion suggestions run on it alone.
- ``doclen/`` — (doc_id, dl): per-document token counts for BM25's length
  normalization.
- ``stats/`` — ONE row (n_docs, avgdl), computed at build time so every
  query reuses the exact same doubles (bit-for-bit reproducible scores).
- ``_index_meta.json`` — source fingerprint; published atomically.

Freshness: the index directory name embeds a fingerprint (size + mtime) of
the source ``documents.parquet``, so a regenerated fixture can never serve
a stale index — a new fingerprint is simply a new build. Maintenance
without full rebuild is ``apply_epoch_deltas``: the streaming maintainer
(`streaming/river_stream.py:start_index_stream`) lands per-micro-batch
postings epochs; the delta merge keeps only each doc's newest epoch
(latest-version-wins, ES upsert semantics) and refreshes the derived
tables. Reference parity: HBaseParser.java:135-162 (index build),
HBaseRiver.java:1-35 (index maintenance as the product).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import roundn_col
from elasticsearch_hbase_river_spark.operators.retrieval import (
    FUZZY_MAX_DIST,
    FUZZY_TERM,
    SUGGEST_PREFIX,
    SUGGEST_TOP,
)
from elasticsearch_hbase_river_spark.operators.retrieval import (
    ORACLES as _RETRIEVAL_ORACLES,
)
from elasticsearch_hbase_river_spark.operators.search import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOP,
    PHRASE,
    inverted_postings,
)
from elasticsearch_hbase_river_spark.operators.search import (
    ORACLES as _SEARCH_ORACLES,
)
from elasticsearch_hbase_river_spark.sources.tables import load_table

N_BUCKETS = 32
META = "_index_meta.json"

#: Root for on-demand index builds (override with RIVER_INDEX_ROOT).
_DEFAULT_ROOT = os.path.join(tempfile.gettempdir(), "river_search_index")


def _fingerprint(sf_dir: str) -> str:
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return f"{st.st_size}-{st.st_mtime_ns}"


def index_path_for(sf_dir: str) -> str:
    root = os.environ.get("RIVER_INDEX_ROOT", _DEFAULT_ROOT)
    name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(root, f"{name}-{_fingerprint(sf_dir)}")


def _tbucket(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def build_index(spark: SparkSession, docs: DataFrame, path: str) -> None:
    """Materialize the serving layout from a (doc_id, text) corpus.

    Fully distributed: postings are one explode + one partial-aggregated
    shuffle (the same build `q_inverted_index` runs), then ONE repartition
    on the bucket key so each writer task owns whole buckets. Derived
    tables (vocab / doclen / stats) are partial-aggregated shuffles or
    1-row aggregates — nothing corpus-sized touches the driver."""
    _materialize_from_postings(spark, inverted_postings(docs), path)


def ensure_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent bootstrap: build the index for this corpus fingerprint if
    it doesn't exist yet, then return its path. Queries call this, so the
    FIRST query in a process pays the build and every later query is a pure
    index read (the ES operational model: index once, query many)."""
    path = index_path_for(sf_dir)
    if not os.path.exists(os.path.join(path, META)):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        build_index(spark, docs, path)
    return path


def _terms_buckets(spark: SparkSession, terms: tuple[str, ...]) -> list[int]:
    """Buckets for literal query terms — one local job over |terms| rows
    (query planning, not data processing), yielding LITERAL partition
    filters so the scan prunes to the matching bucket directories."""
    df = spark.createDataFrame([(t,) for t in terms], "token string")
    return sorted({r[0] for r in df.select(_tbucket(F.col("token"))).collect()})


def read_postings(spark: SparkSession, path: str,
                  terms: tuple[str, ...] | None = None) -> DataFrame:
    p = spark.read.parquet(os.path.join(path, "postings"))
    if terms:
        p = p.filter(F.col("tbucket").isin(_terms_buckets(spark, terms))
                     & F.col("token").isin(*terms))
    return p.select("token", "doc_id", "tf", "first_pos", "positions")


def read_vocab(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "vocab"))


def read_doclen(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "doclen"))


def read_stats(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "stats"))


# ---------------------------------------------------------------------------
# Indexed query variants. Each reuses the UN-indexed query's oracle SQL
# verbatim (see ORACLES below): the correctness gate proves the index read
# path is hash-equal to the per-query rebuild.


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 served FROM the materialized index: term postings come
    from the pruned bucket directories, df from the vocab table, dl from
    doclen, and N/avgdl from the 1-row stats table — zero corpus scans,
    zero postings rebuilds (pinned by ``test_plan_shape.py``: no Generate
    node in this plan)."""
    idx = ensure_index(spark, sf_dir)
    tf = (read_postings(spark, idx, BM25_TERMS)
          .select("doc_id", "token", "tf"))
    df_ = (read_vocab(spark, idx)
           .filter(F.col("token").isin(*BM25_TERMS)).select("token", "df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(read_doclen(spark, idx), "doc_id")
        .crossJoin(F.broadcast(read_stats(spark, idx)))
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
    per_doc = (
        scored.select("doc_id", (idf * tf_norm).alias("contrib"))
        .groupBy("doc_id")
        .agg(roundn_col(F.sum("contrib")).alias("score"))
    )
    top = per_doc.orderBy(F.col("score").desc(), F.col("doc_id")).limit(BM25_TOP)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def q_phrase_match_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase query from the index: the two terms' postings come from their
    pruned buckets; the stored position lists (a few rows per term) are
    unpacked and adjacency is the same (doc_id, pos+1) equi-join. Position
    unpack touches only the query terms' postings — never the corpus."""
    idx = ensure_index(spark, sf_dir)
    p = read_postings(spark, idx, PHRASE)
    occ = (p.select("token", "doc_id",
                    F.explode(F.split("positions", ",")).alias("pos_s"))
           .select("token", "doc_id", F.col("pos_s").cast("long").alias("pos")))
    w1 = occ.filter(F.col("token") == PHRASE[0]).select("doc_id", "pos")
    w2 = occ.filter(F.col("token") == PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos"))
    return (w1.join(w2, ["doc_id", "pos"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_occurrences")))


def q_fuzzy_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy term query from the index: edit-distance expansion runs on the
    vocab TABLE (vocab-sized, the ES query-rewrite phase), the expanded
    terms come back to the driver (bounded: the within-distance-1
    neighborhood of one term — a handful of literals, exactly what ES's
    rewrite produces) and become partition-pruning filters on the
    postings."""
    idx = ensure_index(spark, sf_dir)
    matched = tuple(sorted(
        r[0] for r in read_vocab(spark, idx)
        .filter(F.levenshtein(F.col("token"), F.lit(FUZZY_TERM))
                <= FUZZY_MAX_DIST)
        .select("token").collect()))
    if not matched:
        return (read_postings(spark, idx, None).limit(0)
                .select("doc_id", F.lit(0).cast("long").alias("n_hits"),
                        F.lit("").alias("matched_terms")))
    return (read_postings(spark, idx, matched)
            .groupBy("doc_id")
            .agg(F.sum("tf").alias("n_hits"),
                 F.array_join(
                     F.array_sort(F.array_distinct(F.collect_list("token"))),
                     ",").alias("matched_terms")))


def q_suggest_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completion suggester from the index: a prefix filter + top-k over
    the vocab table alone. The corpus is never touched — this is the query
    ES answers from its FST, served here from a vocab-sized relation."""
    idx = ensure_index(spark, sf_dir)
    freq = (read_vocab(spark, idx)
            .filter(F.col("token").startswith(SUGGEST_PREFIX))
            .select("token", "freq"))
    top = freq.orderBy(F.col("freq").desc(), "token").limit(SUGGEST_TOP)
    w = Window.orderBy(F.col("freq").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Streaming maintenance: merge start_index_stream's epoch deltas into a new
# serving snapshot (latest-version-wins), without rebuilding unchanged docs.


def apply_epoch_deltas(spark: SparkSession, base_path: str,
                       epochs_dir: str, out_path: str) -> None:
    """Produce the NEXT index snapshot at ``out_path``: docs re-indexed in
    any epoch keep only their newest epoch's postings (the same
    latest-version-wins of ``read_inverted_index``); all other docs carry
    over from ``base_path`` untouched. Derived tables are refreshed from
    the merged postings. Snapshot-and-swap keeps readers consistent: they
    hold the old directory until the caller republishes the path.

    Scale shape: the carry-over is ONE anti-join of base postings against
    the (small) changed-doc set — proportional to the delta, not the
    corpus; the changed-doc relation broadcasts."""
    from elasticsearch_hbase_river_spark.streaming.river_stream import (
        read_inverted_index,
    )

    fresh = read_inverted_index(spark, epochs_dir)
    changed = fresh.select("doc_id").distinct()
    base = read_postings(spark, base_path, None)
    merged = (base.join(F.broadcast(changed), "doc_id", "left_anti")
              .unionByName(fresh.select("token", "doc_id", "tf",
                                        "first_pos", "positions")))
    _materialize_from_postings(spark, merged, out_path)


def _materialize_from_postings(spark: SparkSession, post: DataFrame,
                               path: str) -> None:
    """Land a postings relation in the serving layout (the shared tail of
    ``build_index`` and ``apply_epoch_deltas``). Derived tables are
    recomputed FROM the landed postings (one pass over the new files); the
    publish is tmp-dir + atomic rename, so concurrent builders race safely
    (first rename wins, losers discard) and readers never see a partial
    index. Note ``dl`` (doc length) equals the sum of the doc's term
    frequencies, because tokens are exhaustive whitespace splits."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    (post.withColumn("tbucket", _tbucket(F.col("token")))
         .repartition(N_BUCKETS, "tbucket")
         .write.mode("overwrite").partitionBy("tbucket")
         .parquet(os.path.join(tmp, "postings")))
    landed = spark.read.parquet(os.path.join(tmp, "postings"))
    (landed.groupBy("token")
           .agg(F.count(F.lit(1)).cast("long").alias("df"),
                F.sum("tf").cast("long").alias("freq"))
           .coalesce(1).write.mode("overwrite")
           .parquet(os.path.join(tmp, "vocab")))
    doclen = landed.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    doclen.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "doclen"))
    (doclen.agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.avg("dl").alias("avgdl"))
           .coalesce(1).write.mode("overwrite")
           .parquet(os.path.join(tmp, "stats")))
    with open(os.path.join(tmp, META), "w") as f:
        json.dump({"n_buckets": N_BUCKETS}, f)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


QUERIES = {
    "q_bm25_indexed": q_bm25_indexed,
    "q_phrase_match_indexed": q_phrase_match_indexed,
    "q_fuzzy_search_indexed": q_fuzzy_search_indexed,
    "q_suggest_indexed": q_suggest_indexed,
}

#: The indexed variants answer the SAME questions as the rebuild-per-query
#: operators, so they reuse those oracles verbatim — the correctness gate
#: then proves index-read == rebuild, hash-for-hash.
ORACLES = {
    "q_bm25_indexed": _SEARCH_ORACLES["q_bm25"],
    "q_phrase_match_indexed": _SEARCH_ORACLES["q_phrase_match"],
    "q_fuzzy_search_indexed": _RETRIEVAL_ORACLES["q_fuzzy_search"],
    "q_suggest_indexed": _RETRIEVAL_ORACLES["q_suggest"],
}


def q_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_stats`` / ``_cat/indices`` over the materialized index: doc
    count, vocabulary size, postings count, total token count and average
    document length — every figure read from the index's own sidecar
    tables (vocab / doclen / stats), NEVER the corpus. The oracle derives
    the same numbers from the documents table, so the gate proves the
    sidecars stay consistent with the corpus they were built from.

    Scale shape: three sidecar aggregates (vocab- and corpus-doc-sized
    relations, partial-aggregated) combined by broadcasting three 1-row
    relations — no corpus scan, no shuffle of anything big."""
    idx = ensure_index(spark, sf_dir)
    vstats = read_vocab(spark, idx).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum("freq").cast("long").alias("total_tokens"))
    dstats = read_stats(spark, idx).select(
        F.col("n_docs"), roundn_col(F.col("avgdl")).alias("avgdl"))
    return F.broadcast(dstats).crossJoin(F.broadcast(vstats)).select(
        "n_docs", "n_terms", "n_postings", "total_tokens", "avgdl")


QUERIES["q_index_stats"] = q_index_stats

from elasticsearch_hbase_river_spark.functions.determinism import roundn_sql  # noqa: E402
from elasticsearch_hbase_river_spark.operators.search import _POSTINGS_SQL  # noqa: E402

ORACLES["q_index_stats"] = f"""
WITH tok AS ({_POSTINGS_SQL}),
post AS (
  SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY token, doc_id),
v AS (
  SELECT CAST(count(DISTINCT token) AS BIGINT) AS n_terms,
         CAST(count(*) AS BIGINT) AS n_postings,
         CAST(sum(tf) AS BIGINT) AS total_tokens
  FROM post),
d AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         {roundn_sql("avg(len(string_split(text, ' ')))")} AS avgdl
  FROM documents)
SELECT n_docs, n_terms, n_postings, total_tokens, avgdl FROM d, v"""


def _index_tfidf_rel(spark: SparkSession, idx: str) -> DataFrame:
    """(doc_id, token, tf, df, n_docs): the tf-idf scoring relation read
    entirely from index tables — the explode + two corpus aggregations the
    rebuild path pays are already materialized as postings/vocab/stats."""
    return (read_postings(spark, idx)
            .select("doc_id", "token", "tf")
            .join(F.broadcast(read_vocab(spark, idx).select("token", "df")),
                  "token")
            .crossJoin(F.broadcast(read_stats(spark, idx).select("n_docs"))))


def q_tfidf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms served FROM the materialized index:
    tf from the postings, df from the vocab sidecar, doc length from
    doclen, N from the 1-row stats table — ZERO corpus scans, zero
    explodes; the only shuffle is the per-doc rank window. Hash-equal to
    `q_tfidf` by the shared oracle."""
    from elasticsearch_hbase_river_spark.operators.text import TFIDF_TOP

    idx = ensure_index(spark, sf_dir)
    scored = (
        _index_tfidf_rel(spark, idx)
        .join(read_doclen(spark, idx), "doc_id")
        .withColumn("tfidf", roundn_col(
            (F.col("tf") / F.col("dl"))
            * F.log(F.col("n_docs").cast("double") / F.col("df")))))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= TFIDF_TOP)
                  .select("doc_id", "token", "tfidf", "rank"))


def q_more_like_this_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """more_like_this served FROM the materialized index: the tf-idf
    weight relation comes from postings ⨝ vocab ⨝ stats (no explode, no
    per-query corpus aggregation); the query doc's vector broadcasts into
    the shared-token candidate join exactly like the rebuild path.
    Hash-equal to `q_more_like_this` by the shared oracle."""
    from elasticsearch_hbase_river_spark.operators.search import (
        MLT_DOC_ID, MLT_TOP,
    )

    idx = ensure_index(spark, sf_dir)
    tfidf = (
        _index_tfidf_rel(spark, idx)
        .select("doc_id", "token",
                (F.col("tf") * F.log(F.col("n_docs").cast("double")
                                     / F.col("df"))).alias("wt"))
        # read three times (norms, query vector, similarity join) — the
        # multi-pass materialization trade, same as the rebuild path
        .localCheckpoint(eager=True)
    )
    norms = tfidf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("norm"))
    qvec = (tfidf.filter(F.col("doc_id") == MLT_DOC_ID)
                 .select("token", F.col("wt").alias("qwt")))
    qnorm = norms.filter(F.col("doc_id") == MLT_DOC_ID).select(
        F.col("norm").alias("qnorm"))
    sims = (
        tfidf.filter(F.col("doc_id") != MLT_DOC_ID)
        .join(F.broadcast(qvec), "token")
        .groupBy("doc_id")
        .agg(F.sum(F.col("wt") * F.col("qwt")).alias("dot"))
        .join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select("doc_id",
                roundn_col(F.col("dot") / (F.col("norm") * F.col("qnorm")))
                .alias("cosine"))
    )
    top = sims.orderBy(F.col("cosine").desc(), F.col("doc_id")).limit(MLT_TOP)
    w = Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


from elasticsearch_hbase_river_spark.operators.text import (  # noqa: E402
    ORACLES as _TEXT_ORACLES,
)

QUERIES["q_tfidf_indexed"] = q_tfidf_indexed
QUERIES["q_more_like_this_indexed"] = q_more_like_this_indexed
ORACLES["q_tfidf_indexed"] = _TEXT_ORACLES["q_tfidf"]
ORACLES["q_more_like_this_indexed"] = _SEARCH_ORACLES["q_more_like_this"]


def q_unigram_logprob_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM quality signal served FROM the materialized index:
    the LM (per-token corpus frequency + totals) is the vocab sidecar
    verbatim, and the per-document occurrence relation is the postings'
    (doc_id, token, tf) — the scoring becomes a tf-weighted mean with no
    explode and no corpus aggregation. Hash-equal to
    ``q_unigram_logprob`` by the shared oracle."""
    idx = ensure_index(spark, sf_dir)
    vocab = read_vocab(spark, idx)
    totals = vocab.agg(F.sum("freq").alias("total"),
                       F.count(F.lit(1)).alias("vocab"))
    logp = F.log((F.col("freq") + 1.0)
                 / (F.col("total") + F.col("vocab")).cast("double"))
    return (
        read_postings(spark, idx).select("doc_id", "token", "tf")
        .join(F.broadcast(vocab.select("token", "freq")), "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"),
             (F.sum(F.col("tf") * logp) / F.sum("tf")).alias("alp"))
        .select("doc_id", "n_tokens",
                roundn_col(F.col("alp")).alias("avg_logprob"))
    )


QUERIES["q_unigram_logprob_indexed"] = q_unigram_logprob_indexed
ORACLES["q_unigram_logprob_indexed"] = _TEXT_ORACLES["q_unigram_logprob"]


# ---------------------------------------------------------------------------
# Aliases — ES's zero-downtime reindex primitive: readers resolve a NAME to
# whatever index the alias currently points at; a reindex builds a brand-new
# index directory and repoints the alias atomically, so readers never see a
# partial index and the old generation stays intact for rollback.


def write_alias(alias_path: str, index_path: str) -> None:
    """Atomically point ``alias_path`` at ``index_path`` (tmp + rename —
    same publish discipline as the index itself)."""
    tmp = f"{alias_path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"index": index_path}, f)
    os.replace(tmp, alias_path)


def resolve_alias(alias_path: str) -> str:
    with open(alias_path) as f:
        return json.load(f)["index"]


def reindex(spark: SparkSession, docs: DataFrame, alias_path: str,
            new_index_path: str) -> str:
    """ES ``_reindex`` + alias swap: build a NEW index generation from the
    (possibly transformed/filtered) document relation, then atomically
    repoint the alias. Readers resolving the alias mid-build keep the old
    generation; after the swap they get the new one. Returns the new
    path."""
    build_index(spark, docs.select("doc_id", "text"), new_index_path)
    write_alias(alias_path, new_index_path)
    return new_index_path
