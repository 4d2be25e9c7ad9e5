"""Retrieval extensions: hybrid lexical+vector search, facets, highlighting,
and winnowing fingerprints.

The reference feeds an Elasticsearch index (HBaseRiver.java:1-35); round 2
added the core query surface (`operators/search.py`). This module completes
the retrieval loop with the next queries an ES user actually runs, plus a
robust plagiarism-grade fingerprint for the curation pipeline:

- ``q_hybrid_search``     : reciprocal-rank fusion of BM25 (text) and cosine
                            KNN (embedding) rankings — the standard hybrid
                            retrieval pattern; both branches are two-phase
                            top-k, fusion joins two ≤k-row relations.
- ``q_search_facets``     : ES terms-aggregation alongside a query: bucket
                            counts + metric per facet field, computed in ONE
                            pass with a 2-way melt (never one groupBy per
                            facet field over the corpus).
- ``q_highlight``         : ES highlighting: the first query-term hit with
                            ±3 tokens of context — pure map-side array ops.
- ``q_winnow_fingerprint``: winnowing document fingerprints (Schleimer et
                            al., SIGMOD'03, the MOSS algorithm): k-gram
                            hashes, sliding-window minima, distinct set —
                            entirely inside whole-stage codegen via
                            higher-order functions, zero shuffles.

Scale notes: hybrid fuses two TakeOrderedAndProject branches (each task
keeps a local top-k; only k·P rows reach the driver-side merge) and joins
two ≤20-row relations — broadcast territory. Facets shuffle once on
(facet, bucket) with partial aggregation. Highlight and winnowing are pure
projections: at 100 TB they pipeline behind the scan with no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.analyzer import (
    ANALYZE_TOKS_SQL,
    analyze_tokens,
)
from elasticsearch_hbase_river_spark.functions.determinism import roundn_col, roundn_sql
from elasticsearch_hbase_river_spark.operators.search import ORACLES as _SEARCH_ORACLES
from elasticsearch_hbase_river_spark.operators.search import (
    _POSTINGS_SQL,
    _postings,
    bm25_scores,
    q_bm25,
)
from elasticsearch_hbase_river_spark.operators.search import BM25_TOP as _BM25_TOP
from elasticsearch_hbase_river_spark.operators.similarity import (
    _dot,
    _dot_sql,
    _norm,
    _norm_sql,
)
from elasticsearch_hbase_river_spark.sources.tables import load_table

RRF_K = 60          # standard reciprocal-rank-fusion constant
HYBRID_TOP = 10
SEM_TOP = 20        # semantic branch depth (lexical depth = BM25_TOP = 20)
HYBRID_QVEC = 0     # query vector: the embedding of doc 0 (vec_id == doc_id)

FACET_TERM = "spark"        # facets computed over docs matching this term
FACET_FIELDS = ("lang", "source")

HL_TERM = "data"            # highlighting query term
HL_CONTEXT = 3              # tokens of context on each side

WINNOW_K = 3                # k-gram size (tokens)
WINNOW_W = 4                # winnowing window (hashes)
#: Karp-Rabin gram-hash parameters: token hash = first 8 md5 hex digits as
#: an integer mod M; gram hash = Horner fold with base B mod M. All values
#: stay < 2^52, so the arithmetic is exact (and identical) in both
#: engines' 64-bit integers. Integer gram hashing replaced md5-per-gram in
#: round 4: one md5 per TOKEN instead of one per gram, and the window
#: minima become integer compares — measured 1.75 s -> 0.55 s for the
#: fingerprint stage at sf0.1 (same 3x the SimHash bit-math rewrite won).
WINNOW_B = 1_000_003
WINNOW_M = 2_147_483_647


def _sem_top_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic retriever branch shared by the RRF and linear
    hybrids: cosine top-{SEM_TOP} ``(doc_id, cosine)`` for the fixed
    query vector. The 1-row query side is broadcast (map-side) and the
    branch ends in TakeOrderedAndProject."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding",
                        _norm(F.col("embedding")).alias("enorm"))
    qv = emb.filter(F.col("vec_id") == HYBRID_QVEC).select(
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qnorm"))
    cos = roundn_col(_dot(F.col("qe"), F.col("embedding"))
                     / (F.col("qnorm") * F.col("enorm")))
    return (corpus.crossJoin(F.broadcast(qv))
            .filter(F.col("doc_id") != HYBRID_QVEC)
            .select("doc_id", cos.alias("cosine"))
            .orderBy(F.col("cosine").desc(), "doc_id").limit(SEM_TOP))


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 and cosine-KNN top-20 fused with
    reciprocal-rank fusion — ``score = Σ 1/(60 + rank)`` over the rankings
    that contain the doc. Embeddings are keyed by ``vec_id == doc_id``.

    Both branches end in ``orderBy().limit(k)`` (TakeOrderedAndProject);
    the fusion is a full-outer join of two ≤20-row relations, so nothing
    after the two top-k merges is corpus-sized."""
    lex = q_bm25(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("lex_rank"))
    sem_top = _sem_top_cosine(spark, sf_dir)
    wsem = Window.orderBy(F.col("cosine").desc(), "doc_id")
    sem = (sem_top.withColumn("sem_rank",
                              F.row_number().over(wsem).cast("long"))
           .select("doc_id", "sem_rank"))

    rrf = roundn_col(
        F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0)))
    fused = (lex.join(sem, "doc_id", "full_outer")
             .select("doc_id", rrf.alias("rrf_score"))
             .orderBy(F.col("rrf_score").desc(), "doc_id").limit(HYBRID_TOP))
    w = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return fused.withColumn("rank", F.row_number().over(w).cast("long"))


#: Linear-retriever weights (ES ``linear`` retriever, the weighted dual
#: of RRF) and the min-max normalizer's degenerate-window floor.
LIN_W_LEX = 0.7
LIN_W_SEM = 0.3


def q_retriever_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``linear`` retriever: the weighted-sum hybrid —
    ``score = w_lex · minmax(bm25) + w_sem · minmax(cosine)`` where each
    retriever's scores are MIN-MAX normalized over its own top-k window
    (ES's documented ``minmax`` normalizer; a retriever that misses the
    doc contributes 0). The rank-free dual of ``q_hybrid_search``'s RRF.

    Scale shape: both branches end in TakeOrderedAndProject (≤{SEM_TOP}
    rows); the normalizer stats are 1-row aggregates over those tiny
    relations and everything after the two top-k merges is k-row work."""
    lex_top = q_bm25(spark, sf_dir).select("doc_id", "score")
    lstats = lex_top.agg(F.min("score").alias("lmn"),
                         F.max("score").alias("lmx"))
    lex = (lex_top.crossJoin(F.broadcast(lstats))
           .select("doc_id",
                   ((F.col("score") - F.col("lmn"))
                    / F.greatest(F.col("lmx") - F.col("lmn"),
                                 F.lit(1e-12))).alias("lnorm")))

    sem_top = _sem_top_cosine(spark, sf_dir)
    sstats = sem_top.agg(F.min("cosine").alias("smn"),
                         F.max("cosine").alias("smx"))
    sem = (sem_top.crossJoin(F.broadcast(sstats))
           .select("doc_id",
                   ((F.col("cosine") - F.col("smn"))
                    / F.greatest(F.col("smx") - F.col("smn"),
                                 F.lit(1e-12))).alias("snorm")))

    lin = roundn_col(F.lit(LIN_W_LEX) * F.coalesce("lnorm", F.lit(0.0))
                     + F.lit(LIN_W_SEM) * F.coalesce("snorm", F.lit(0.0)))
    fused = (lex.join(sem, "doc_id", "full_outer")
             .select("doc_id", lin.alias("lin_score"))
             .orderBy(F.col("lin_score").desc(), "doc_id")
             .limit(HYBRID_TOP))
    w = Window.orderBy(F.col("lin_score").desc(), "doc_id")
    return fused.withColumn("rank", F.row_number().over(w).cast("long"))


def q_search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms-aggregations for a query: per-bucket doc counts and an
    average-length metric for each facet field, over docs matching the
    query term. ONE pass: the facet fields melt to (facet, bucket) rows
    (2× fan-out, map-side) and a single partial-aggregated shuffle on
    (facet, bucket) — never one corpus groupBy per facet."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.array_contains(analyze_tokens(F.col("text")), FACET_TERM))
    melted = docs.select(
        "n_chars",
        F.explode(F.array(*[
            F.struct(F.lit(f).alias("facet"), F.col(f).alias("bucket"))
            for f in FACET_FIELDS])).alias("fb"))
    return (melted.groupBy(F.col("fb.facet").alias("facet"),
                           F.col("fb.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 roundn_col(F.avg("n_chars")).alias("avg_chars")))


def q_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES highlighting: for every doc containing the query term, the
    1-based position of its first occurrence and a snippet of ±3 tokens
    around it. Pure array projection — pipelines behind the scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = analyze_tokens(F.col("text"))
    pos = F.array_position(toks, HL_TERM)
    start = F.greatest(pos - HL_CONTEXT, F.lit(1))
    snippet = F.array_join(
        F.slice(toks, start, pos + HL_CONTEXT - start + 1), " ")
    return (docs.select("doc_id", pos.alias("term_pos"),
                        snippet.alias("snippet"))
            .filter(F.col("term_pos") > 0))


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    scheme): hash every k-gram of tokens, slide a w-hash window keeping
    each window's minimum, emit the distinct fingerprint set. Guarantees
    a shared fingerprint for any sufficiently long shared passage —
    stronger than the single rolling hash of ``q_fingerprint``.

    Everything is higher-order functions over the token array (Karp-Rabin
    integer gram hashes over per-token md5 ints, integer window minima —
    exact and identical in both engines): no explode, no shuffle,
    whole-stage codegen."""
    staged = _winnow_sets(spark, sf_dir)
    return staged.select(
        "doc_id",
        F.col("n_grams"),
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_join(F.transform("fps", lambda x: x.cast("string")), ",")
        .alias("fingerprints"))


def _winnow_sets(spark: SparkSession, sf_dir: str,
                 fanout: bool = False) -> DataFrame:
    """(doc_id, n_grams, fps): the distinct sorted winnowing fingerprint
    set per document — shared by the per-doc query and the overlap join.

    Gram hashing is one md5 per TOKEN (hex prefix -> int mod M), then a
    Horner polynomial per k-gram — pure multiply-add inside codegen, ~3x
    the throughput of hashing every k-gram's concatenated string.

    ``fanout`` (scale-adaptive, guide §2.5) is OPT-IN by caller:
    q_winnow_overlap fans the Horner hash chain out of the fixture's one
    scan task (sf0.1 A/B: first-run 5.2 → 1.3 s, warm neutral — its
    checkpoint shuffles anyway); q_winnow_fingerprint stays a PURE
    zero-exchange projection pipelining behind the scan (the operator's
    plan contract, pinned by test_winnow_and_highlight_are_shuffle_free;
    the ~0.3 s fixture-scale fanout win there is forgone to keep it)."""
    docs = load_table(spark, sf_dir, "documents", fanout=fanout)
    toks = F.split(F.col("text"), " ")
    th = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
        .cast("long") % WINNOW_M)
    staged0 = docs.select("doc_id", th.alias("th"))
    n = F.size("th")

    def gram(i):
        acc = F.element_at(F.col("th"), i + 1)
        for j in range(1, WINNOW_K):
            acc = (acc * WINNOW_B % WINNOW_M) + F.element_at(
                F.col("th"), i + 1 + j)
        return acc % WINNOW_M

    grams = F.when(
        n >= WINNOW_K,
        F.transform(F.sequence(F.lit(0), n - WINNOW_K), gram),
    ).otherwise(F.array().cast("array<bigint>"))
    staged = staged0.select("doc_id", grams.alias("grams"))
    m = F.size("grams")
    fps = (
        F.when(m >= WINNOW_W,
               F.transform(F.sequence(F.lit(0), m - WINNOW_W),
                           lambda j: F.array_min(
                               F.slice(F.col("grams"), j + 1, WINNOW_W))))
        .when(m > 0, F.array(F.array_min("grams")))
        .otherwise(F.array().cast("array<bigint>")))
    return staged.select(
        "doc_id", m.cast("long").alias("n_grams"),
        F.array_sort(F.array_distinct(fps)).alias("fps"))


PAGE_SIZE = 5


def q_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``search_after`` keyset pagination: page 2 of the BM25 ranking —
    the PAGE_SIZE results strictly after the page-1 cursor, where the
    cursor is the (score, doc_id) sort key of page 1's last hit.

    This is the deep-pagination shape that survives scale: page 1 and the
    cursor are TakeOrderedAndProject top-k (the cursor is ONE broadcast
    row), page 2 filters the scored relation by the keyset predicate and
    takes another local top-k — no OFFSET, no global window, no
    re-ranking of everything above the page."""
    # read twice (cursor + page filter) — the multi-pass materialization
    # trade, same as q_more_like_this / q_winnow_overlap
    scores = bm25_scores(spark, sf_dir).localCheckpoint(eager=True)
    cursor = (scores.orderBy(F.col("score").desc(), "doc_id").limit(PAGE_SIZE)
              .orderBy(F.col("score").asc(), F.col("doc_id").desc()).limit(1)
              .select(F.col("score").alias("c_score"),
                      F.col("doc_id").alias("c_doc")))
    after = ((F.col("score") < F.col("c_score"))
             | ((F.col("score") == F.col("c_score"))
                & (F.col("doc_id") > F.col("c_doc"))))
    page2 = (scores.crossJoin(F.broadcast(cursor))
             .filter(after)
             .select("doc_id", "score")
             .orderBy(F.col("score").desc(), "doc_id").limit(PAGE_SIZE))
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return page2.withColumn("page_rank",
                            F.row_number().over(w).cast("long"))


SUGGEST_PREFIX = "s"
SUGGEST_TOP = 5


def q_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester: top-5 vocabulary completions of a prefix,
    ranked by corpus term frequency. The frequency table is one
    partial-aggregated shuffle; the prefix filter sits below it (only
    matching tokens are aggregated), and the ranking is a
    TakeOrderedAndProject over the (tiny) matching vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (_postings(docs)
            .filter(F.col("token").startswith(SUGGEST_PREFIX))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("freq")))
    top = freq.orderBy(F.col("freq").desc(), "token").limit(SUGGEST_TOP)
    w = Window.orderBy(F.col("freq").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


FUZZY_TERM = "spark"
FUZZY_MAX_DIST = 1


def q_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzzy term query (``fuzziness: 1``): match docs containing any
    token within edit distance 1 of the query term. Query expansion runs
    on the DISTINCT vocabulary (vocab-sized, not corpus-sized) with the
    JVM levenshtein built-in; the expanded term set broadcasts into an
    equi-join against the postings — the expensive edit-distance compare
    never touches a corpus-sized relation."""
    docs = load_table(spark, sf_dir, "documents")
    post = _postings(docs)
    matched = (post.select("token").distinct()
               .filter(F.levenshtein(F.col("token"), F.lit(FUZZY_TERM))
                       <= FUZZY_MAX_DIST))
    return (post.join(F.broadcast(matched), "token")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits"),
                 F.array_join(
                     F.array_sort(F.array_distinct(F.collect_list("token"))),
                     ",").alias("matched_terms")))


#: Phrase-suggester input: two misspelled query terms ("did you mean").
PSUG_PHRASE = ("spak", "windoww")
PSUG_MAX_DIST = 1
PSUG_TOP = 5


def q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``phrase`` suggester — the "did you mean" correction: per query
    term, candidate corrections are vocabulary tokens within edit
    distance {PSUG_MAX_DIST} (Lucene's DirectCandidateGenerator); whole
    candidate PHRASES are ranked by a Laplace-smoothed bigram language
    model over the corpus, ``ln P(c1) + ln P(c2|c1)`` with
    ``P(c2|c1) = (c(c1,c2)+1)/(c(c1)+V)`` — the suggester's real_word_
    error_likelihood machinery, top-{PSUG_TOP}.

    Scale shape: the unigram/bigram model derives from ONE tokenize +
    explode pass (successor carried in the struct — the q_bigram_logprob
    shape); each candidate set is a levenshtein filter on the vocab-sized
    unigram relation; the candidate-pair expansion is tiny×tiny (each
    side ≤ a handful of rows, broadcast); bigram lookups broadcast the
    pair list INTO the corpus-sized bigram counts, never the reverse."""
    docs = load_table(spark, sf_dir, "documents")
    toks = analyze_tokens(F.col("text"))
    staged = docs.select(toks.alias("toks")).filter(F.size("toks") > 0)
    n = F.size(F.col("toks"))
    grams = F.transform(F.sequence(F.lit(0), n - 1),
                        lambda i: F.struct(
                            F.get(F.col("toks"), i).alias("w1"),
                            F.get(F.col("toks"), i + 1).alias("w2")))
    # read 4x, RECOMPUTED per consumer: an eager localCheckpoint of this
    # corpus-sized gram relation is the bimodal block-manager residency
    # the bigram-LM fix measured (text.py:q_bigram_logprob — 4-48 s under
    # session pressure vs a flat recompute); linear tokenize work wins
    occ = (staged.select(F.explode(grams).alias("bg"))
           .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")))
    uf = occ.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = occ.agg(F.count(F.lit(1)).cast("long").alias("t"))
    v = uf.agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    bf = (occ.filter(F.col("w2").isNotNull())
          .groupBy("w1", "w2")
          .agg(F.count(F.lit(1)).cast("long").alias("bcnt")))
    c1 = (uf.filter(F.levenshtein(F.col("w1"), F.lit(PSUG_PHRASE[0]))
                    <= PSUG_MAX_DIST).select("w1", "c"))
    c2 = (uf.filter(F.levenshtein(F.col("w1"), F.lit(PSUG_PHRASE[1]))
                    <= PSUG_MAX_DIST).select(F.col("w1").alias("w2")))
    pairs = c1.crossJoin(F.broadcast(c2))
    found = bf.join(F.broadcast(pairs.select("w1", "w2")), ["w1", "w2"])
    scored = (pairs.join(F.broadcast(found), ["w1", "w2"], "left")
              .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(v))
              .select(
                  F.concat_ws(" ", "w1", "w2").alias("suggestion"),
                  roundn_col(
                      F.log(F.col("c").cast("double") / F.col("t"))
                      + F.log((F.coalesce("bcnt", F.lit(0)) + 1).cast("double")
                              / (F.col("c") + F.col("vocab"))), 4)
                  .alias("score")))
    top = scored.orderBy(F.col("score").desc(), "suggestion").limit(PSUG_TOP)
    w = Window.orderBy(F.col("score").desc(), "suggestion")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


FUZZY2_TERM = "spark"
FUZZY2_MAX_DIST = 2


def q_fuzzy_search_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzzy term query with ``fuzziness: 2``: match docs containing
    any token within edit distance 2 of the query term. Same
    vocab-expansion shape as :func:`q_fuzzy_search` — the levenshtein
    compare runs on the DISTINCT vocabulary only; this is the honest
    what-if-no-index rebuild twin of ``q_fuzzy_search_d2_indexed``, whose
    delete-≤2 vkeys sidecar replaces the vocab scan with a pruned-slice
    read."""
    docs = load_table(spark, sf_dir, "documents")
    post = _postings(docs)
    matched = (post.select("token").distinct()
               .filter(F.levenshtein(F.col("token"), F.lit(FUZZY2_TERM))
                       <= FUZZY2_MAX_DIST))
    return (post.join(F.broadcast(matched), "token")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits"),
                 F.array_join(
                     F.array_sort(F.array_distinct(F.collect_list("token"))),
                     ",").alias("matched_terms")))


WINNOW_MIN_SHARED = 2
#: MOSS-style common-fingerprint suppression: a fingerprint shared by more
#: than this many documents is boilerplate (its pair expansion is
#: quadratic in bucket occupancy — measured 80M join rows at 10x sf0.1,
#: task OOM; at 100 TB any uncapped common fingerprint is unbounded).
WINNOW_MAX_DF = 50


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document winnowing overlap — the MOSS use case: candidate
    near-dup/plagiarism pairs are documents sharing >=2 fingerprints, with
    a containment score ``n_shared / min(|fps_a|, |fps_b|)``.

    Scale shape: MOSS's common-fingerprint suppression is applied first —
    fingerprints in more than WINNOW_MAX_DF documents are boilerplate and
    their pair expansion is quadratic in bucket occupancy (measured: the
    uncapped join emits 80M rows at 10x sf0.1 and OOMs a default-memory
    task; at 100 TB one template header would be unbounded). After the
    cap, the pair join is an EQUI-join on the fingerprint value whose
    output is bounded by cap² per bucket; the kept-fingerprint relation is
    materialized once before the self-join (sort-merge pinned — a corpus
    broadcast is never the right plan), the multi-pass trade measured on
    `candidate_pairs`. Containment uses the discriminative (kept)
    fingerprint sets on both sides.

    df and nf ride WINDOWS over the two shuffles the relation needs
    anyway (r12, guide §2.4 — operations keyed the same way share one
    exchange): the old groupBy(fp)+join-back and groupBy(doc_id)+join-back
    each added an aggregate plus a corpus-sized sort-merge join purely to
    re-attach a count the window computes in place. fps are distinct per
    doc, so count-over-partition equals the joined-back group count
    exactly; 2 aggregates + 2 SMJs removed, same rows."""
    sets = (_winnow_sets(spark, sf_dir, fanout=True)
            .select("doc_id", F.explode("fps").alias("fp")))
    wdf = Window.partitionBy("fp")
    wnf = Window.partitionBy("doc_id")
    keptn = (sets.withColumn("df", F.count(F.lit(1)).over(wdf))
             .filter(F.col("df") <= WINNOW_MAX_DF)
             .withColumn("nf", F.count(F.lit(1)).over(wnf))
             .select("doc_id", "fp", "nf")
             .localCheckpoint(eager=True))
    a, b = keptn.alias("a"), keptn.alias("b")
    return (
        a.hint("merge").join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"),
             F.min(F.col("a.nf")).alias("nfa"),
             F.min(F.col("b.nf")).alias("nfb"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
        .select("doc_a", "doc_b", "n_shared",
                roundn_col(F.col("n_shared")
                           / F.least("nfa", "nfb")).alias("overlap"))
    )


RESCORE_PHRASE = ("spark", "join")   # secondary scorer: exact-phrase hits
RESCORE_TOP = 10
RESCORE_W_PRIMARY = 0.7
RESCORE_W_SECONDARY = 0.3


def q_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rescore``: rerank the BM25 top-window (top-{BM25_TOP}) with a
    more expensive secondary scorer — exact-phrase occurrence count —
    combining ``0.7·bm25 + 0.3·ln(1+n_phrase)``; emit the re-ranked
    top-10.  This is ES's two-stage ranking: the cheap query scores the
    corpus, the expensive one touches only the window.

    Scale shape: the window is a ≤k-row broadcast; the secondary scorer's
    postings are filtered to the phrase terms AND semi-joined to the
    window's doc_ids BEFORE the adjacency join, so its cost is
    O(window · phrase frequency), independent of corpus size.

    The ≤{BM25_TOP}-row primary window is checkpointed ONCE (r12): it
    feeds both the semi-join's id list and the final rescore join, and
    uncheckpointed the corpus-sized BM25 subtree executed twice — once
    building the id broadcast, once again in the final action."""
    base = (q_bm25(spark, sf_dir).select("doc_id", "score")
            .localCheckpoint(eager=True))
    base_ids = base.select("doc_id")
    # ONE postings pass for both phrase terms (two separate filters over
    # _postings make Catalyst tokenize the corpus twice); the branch split
    # happens on the already-filtered window-sized relation.
    occ = (_postings(load_table(spark, sf_dir, "documents"))
           .filter(F.col("token").isin(*RESCORE_PHRASE))
           .join(F.broadcast(base_ids), "doc_id", "left_semi")
           .select("doc_id", "token", "pos")
           .localCheckpoint(eager=True))  # window-sized: ≤k docs' term rows
    w1 = (occ.filter(F.col("token") == RESCORE_PHRASE[0])
          .select("doc_id", "pos"))
    w2 = (occ.filter(F.col("token") == RESCORE_PHRASE[1])
          .select("doc_id", (F.col("pos") - 1).alias("pos")))
    ph = (w1.join(w2, ["doc_id", "pos"])
          .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_phrase")))
    resc = (
        base.join(F.broadcast(ph), "doc_id", "left")
        .select("doc_id", roundn_col(
            F.lit(RESCORE_W_PRIMARY) * F.col("score")
            + F.lit(RESCORE_W_SECONDARY)
            * F.log1p(F.coalesce("n_phrase", F.lit(0)))).alias("rescore")))
    top = resc.orderBy(F.col("rescore").desc(), F.col("doc_id")).limit(RESCORE_TOP)
    w = Window.orderBy(F.col("rescore").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


QUERIES = {
    "q_hybrid_search": q_hybrid_search,
    "q_retriever_linear": q_retriever_linear,
    "q_rescore": q_rescore,
    "q_search_facets": q_search_facets,
    "q_highlight": q_highlight,
    "q_winnow_fingerprint": q_winnow_fingerprint,
    "q_winnow_overlap": q_winnow_overlap,
    "q_fuzzy_search": q_fuzzy_search,
    "q_fuzzy_search_d2": q_fuzzy_search_d2,
    "q_phrase_suggest": q_phrase_suggest,
    "q_search_after": q_search_after,
    "q_suggest": q_suggest,
}

# the shared cosine-top-k CTE (_SEM_COS_SQL) and the RRF rank view over
# it (_SEM_SQL) are defined below the QUERIES map, before ORACLES

_WINNOW_TH_SQL = f"""
list_transform(string_split(text, ' '),
               tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT % {WINNOW_M})"""


def _winnow_gram_horner_sql() -> str:
    """The same Horner fold `_winnow_sets` runs, as DuckDB SQL text."""
    acc = "th[i + 1]"
    for j in range(1, WINNOW_K):
        acc = f"(({acc}) * {WINNOW_B} % {WINNOW_M}) + th[i + 1 + {j}]"
    return f"(({acc}) % {WINNOW_M})"


_WINNOW_GRAMS_SQL = f"""
CASE WHEN len(th) >= {WINNOW_K}
     THEN list_transform(range(0, len(th) - {WINNOW_K} + 1),
            i -> {_winnow_gram_horner_sql()})
     ELSE CAST([] AS BIGINT[]) END"""

_SEM_COS_SQL = f"""
WITH qv AS (
  SELECT embedding AS qe, {_norm_sql('embedding')} AS qnorm
  FROM embeddings WHERE vec_id = {HYBRID_QVEC}),
c AS (
  SELECT vec_id AS doc_id, embedding, {_norm_sql('embedding')} AS enorm
  FROM embeddings),
scored AS (
  SELECT doc_id,
         {roundn_sql(_dot_sql('qe', 'embedding') + ' / (qnorm * enorm)')}
           AS cosine
  FROM c, qv WHERE doc_id <> {HYBRID_QVEC}),
ranked AS (
  SELECT doc_id, cosine,
         CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT)
           AS sem_rank
  FROM scored)
SELECT doc_id, cosine FROM ranked WHERE sem_rank <= {SEM_TOP}"""

# RRF's view of the same branch: re-rank the ≤k cosine rows (identical
# ordering → identical ranks)
_SEM_SQL = f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT)
         AS sem_rank
FROM ({_SEM_COS_SQL})"""

ORACLES = {
    "q_retriever_linear": f"""
WITH lex_top AS (
  SELECT doc_id, score FROM ({_SEARCH_ORACLES["q_bm25"]}) b),
lstats AS (SELECT min(score) AS lmn, max(score) AS lmx FROM lex_top),
lex AS (
  SELECT doc_id,
         (score - lmn) / greatest(lmx - lmn, 1e-12) AS lnorm
  FROM lex_top, lstats),
sem_top AS ({_SEM_COS_SQL}),
sstats AS (SELECT min(cosine) AS smn, max(cosine) AS smx FROM sem_top),
sem AS (
  SELECT doc_id,
         (cosine - smn) / greatest(smx - smn, 1e-12) AS snorm
  FROM sem_top, sstats),
fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         {roundn_sql(f"{LIN_W_LEX}e0 * coalesce(lnorm, 0e0)"
                     f" + {LIN_W_SEM}e0 * coalesce(snorm, 0e0)")}
           AS lin_score
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
ranked AS (
  SELECT doc_id, lin_score,
         CAST(row_number() OVER (ORDER BY lin_score DESC, doc_id)
              AS BIGINT) AS rank
  FROM fused)
SELECT * FROM ranked WHERE rank <= {HYBRID_TOP}""",

    "q_hybrid_search": f"""
WITH lex AS (
  SELECT doc_id, rank AS lex_rank FROM ({_SEARCH_ORACLES["q_bm25"]}) b),
sem AS ({_SEM_SQL}),
fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         {roundn_sql(f"coalesce(1.0 / ({RRF_K} + lex_rank), 0)"
                     f" + coalesce(1.0 / ({RRF_K} + sem_rank), 0)")}
           AS rrf_score
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
ranked AS (
  SELECT doc_id, rrf_score,
         CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
           AS rank
  FROM fused)
SELECT * FROM ranked WHERE rank <= {HYBRID_TOP}""",

    "q_search_facets": f"""
WITH m AS (
  SELECT lang, source, n_chars FROM documents
  WHERE list_contains({ANALYZE_TOKS_SQL}, '{FACET_TERM}')),
u AS (
  SELECT 'lang' AS facet, lang AS bucket, n_chars FROM m
  UNION ALL
  SELECT 'source', source, n_chars FROM m)
SELECT facet, bucket, count(*) AS n_docs,
       {roundn_sql('avg(n_chars)')} AS avg_chars
FROM u GROUP BY facet, bucket""",

    "q_highlight": f"""
WITH t AS (
  SELECT doc_id, toks,
         CAST(list_position(toks, '{HL_TERM}') AS BIGINT) AS term_pos
  FROM (SELECT doc_id, {ANALYZE_TOKS_SQL} AS toks FROM documents))
SELECT doc_id, term_pos,
       array_to_string(
         toks[greatest(term_pos - {HL_CONTEXT}, 1) : term_pos + {HL_CONTEXT}],
         ' ') AS snippet
FROM t WHERE term_pos IS NOT NULL AND term_pos > 0""",

    "q_winnow_fingerprint": f"""
WITH t AS (
  SELECT doc_id, {_WINNOW_TH_SQL} AS th FROM documents),
g AS (
  SELECT doc_id, {_WINNOW_GRAMS_SQL} AS grams FROM t),
f AS (
  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
         CASE WHEN len(grams) >= {WINNOW_W}
              THEN list_transform(range(0, len(grams) - {WINNOW_W} + 1),
                     j -> list_min(grams[j + 1 : j + {WINNOW_W}]))
              WHEN len(grams) > 0 THEN [list_min(grams)]
              ELSE CAST([] AS BIGINT[]) END AS fps
  FROM g)
SELECT doc_id, n_grams,
       CAST(len(list_distinct(fps)) AS BIGINT) AS n_fingerprints,
       array_to_string(
         list_transform(list_sort(list_distinct(fps)),
                        x -> CAST(x AS VARCHAR)), ',') AS fingerprints
FROM f""",

    "q_suggest": f"""
WITH tok AS ({_POSTINGS_SQL}),
freq AS (
  SELECT token, count(*) AS freq FROM tok
  WHERE token LIKE '{SUGGEST_PREFIX}%' GROUP BY token),
ranked AS (
  SELECT token, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank
  FROM freq)
SELECT * FROM ranked WHERE rank <= {SUGGEST_TOP}""",

    "q_rescore": f"""
WITH base AS ({_SEARCH_ORACLES["q_bm25"]}),
tok AS ({_POSTINGS_SQL}),
w1 AS (SELECT doc_id, pos FROM tok
       WHERE token = '{RESCORE_PHRASE[0]}'
         AND doc_id IN (SELECT doc_id FROM base)),
w2 AS (SELECT doc_id, pos - 1 AS pos FROM tok
       WHERE token = '{RESCORE_PHRASE[1]}'),
ph AS (SELECT doc_id, count(*) AS n_phrase
       FROM w1 JOIN w2 USING (doc_id, pos) GROUP BY doc_id),
resc AS (
  SELECT b.doc_id,
         {roundn_sql(f'{RESCORE_W_PRIMARY} * b.score + {RESCORE_W_SECONDARY}'
                     ' * ln(1 + COALESCE(ph.n_phrase, 0))')} AS rescore
  FROM base b LEFT JOIN ph USING (doc_id)),
ranked AS (
  SELECT doc_id, rescore,
         CAST(row_number() OVER (ORDER BY rescore DESC, doc_id) AS BIGINT)
           AS rank
  FROM resc)
SELECT * FROM ranked WHERE rank <= {RESCORE_TOP}""",

    "q_search_after": f"""
SELECT doc_id, score, CAST(rank - {PAGE_SIZE} AS BIGINT) AS page_rank
FROM ({_SEARCH_ORACLES["q_bm25"]}) r
WHERE rank > {PAGE_SIZE} AND rank <= {2 * PAGE_SIZE}""",

    "q_fuzzy_search": f"""
WITH tok AS ({_POSTINGS_SQL}),
v AS (SELECT DISTINCT token FROM tok),
m AS (SELECT token FROM v
      WHERE levenshtein(token, '{FUZZY_TERM}') <= {FUZZY_MAX_DIST})
SELECT doc_id, count(*) AS n_hits,
       array_to_string(list_sort(list_distinct(list(token))), ',')
         AS matched_terms
FROM tok JOIN m USING (token) GROUP BY doc_id""",

    "q_phrase_suggest": f"""
WITH t AS (SELECT {ANALYZE_TOKS_SQL} AS toks FROM documents),
occ AS (
  SELECT unnest(list_transform(range(0, len(toks)),
           i -> {{'w1': toks[i + 1], 'w2': toks[i + 2]}})) AS b
  FROM t WHERE len(toks) > 0),
o AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM occ),
uf AS (SELECT w1 AS w, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM o),
v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uf),
bf AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bcnt
       FROM o WHERE w2 IS NOT NULL GROUP BY 1, 2),
c1 AS (SELECT w AS w1, c FROM uf
       WHERE levenshtein(w, '{PSUG_PHRASE[0]}') <= {PSUG_MAX_DIST}),
c2 AS (SELECT w AS w2 FROM uf
       WHERE levenshtein(w, '{PSUG_PHRASE[1]}') <= {PSUG_MAX_DIST}),
scored AS (
  SELECT c1.w1 || ' ' || c2.w2 AS suggestion,
         {roundn_sql("ln(c1.c::DOUBLE / tot.t)"
                     " + ln((coalesce(bf.bcnt, 0) + 1)::DOUBLE"
                     " / (c1.c + v.vocab))", 4)} AS score
  FROM tot, v, c1 CROSS JOIN c2
  LEFT JOIN bf ON bf.w1 = c1.w1 AND bf.w2 = c2.w2),
ranked AS (
  SELECT suggestion, score,
         CAST(row_number() OVER (ORDER BY score DESC, suggestion) AS BIGINT)
           AS rank
  FROM scored)
SELECT * FROM ranked WHERE rank <= {PSUG_TOP}""",

    "q_fuzzy_search_d2": f"""
WITH tok AS ({_POSTINGS_SQL}),
v AS (SELECT DISTINCT token FROM tok),
m AS (SELECT token FROM v
      WHERE levenshtein(token, '{FUZZY2_TERM}') <= {FUZZY2_MAX_DIST})
SELECT doc_id, count(*) AS n_hits,
       array_to_string(list_sort(list_distinct(list(token))), ',')
         AS matched_terms
FROM tok JOIN m USING (token) GROUP BY doc_id""",

    "q_winnow_overlap": f"""
WITH t AS (
  SELECT doc_id, {_WINNOW_TH_SQL} AS th FROM documents),
g AS (
  SELECT doc_id, {_WINNOW_GRAMS_SQL} AS grams FROM t),
f AS (
  SELECT doc_id,
         CASE WHEN len(grams) >= {WINNOW_W}
              THEN list_transform(range(0, len(grams) - {WINNOW_W} + 1),
                     j -> list_min(grams[j + 1 : j + {WINNOW_W}]))
              WHEN len(grams) > 0 THEN [list_min(grams)]
              ELSE CAST([] AS BIGINT[]) END AS fps
  FROM g),
e AS (
  SELECT doc_id, unnest(list_distinct(fps)) AS fp FROM f),
rare AS (
  SELECT fp FROM e GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DF}),
kept AS (SELECT doc_id, fp FROM e JOIN rare USING (fp)),
nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf
       FROM kept GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         na.nf AS nfa, nb.nf AS nfb
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  JOIN nf na ON na.doc_id = a.doc_id
  JOIN nf nb ON nb.doc_id = b.doc_id)
SELECT doc_a, doc_b, count(*) AS n_shared,
       {roundn_sql('count(*) / least(min(nfa), min(nfb))')} AS overlap
FROM p GROUP BY doc_a, doc_b HAVING count(*) >= {WINNOW_MIN_SHARED}""",
}
