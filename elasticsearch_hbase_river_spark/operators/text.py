"""Text-analysis operators for the training-data pipeline (SURVEY.md §2.3,
BASELINE.json north star: "text analysis ... designed for 100 TB scale").

All ops are per-document map-side column algebra — built-in string/array/
higher-order functions only, zero UDFs, zero shuffles except the final
aggregation where one exists. At 100 TB these scale linearly with input
splits; nothing here collects, sorts globally, or crosses rows (except
``q_tokenize``'s token-frequency shuffle, which is partial-aggregated).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.determinism import roundn_col, roundn_sql
from elasticsearch_hbase_river_spark.sources.tables import load_table

#: Tiny per-language lexicons for the n-gram/stopword language-ID heuristic.
LEXICONS = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: BPE-ish piece pattern: letter runs, digit runs, single other non-space.
PIECE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _toks(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    """# tokens that appear in ``words`` — higher-order filter, JVM-side."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t))).cast("long")


def _sql_count_in(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (f"CAST(len(list_filter(string_split(text, ' '), "
            f"t -> list_contains([{lst}], t))) AS BIGINT)")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality-relevant stats: char/token counts, distinct
    tokens, average token length, stopword ratio."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks).cast("long")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        roundn_col(F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_tokens)
         .alias("avg_token_len"),
        roundn_col(_count_in(toks, STOPWORDS) / n_tokens).alias("stopword_ratio"),
    )


def q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency: explode -> partial-aggregated count. The one
    shuffle in this module, keyed by token (high cardinality, no skew)."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(F.explode(_toks()).alias("token"))
                .groupBy("token")
                .agg(F.count(F.lit(1)).alias("cnt")))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: lexicon-hit scores per language, argmax with a
    deterministic tiebreak (en > de > es > und)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    scores = {lang: _count_in(toks, words) for lang, words in LEXICONS.items()}
    en, de, es = scores["en"], scores["de"], scores["es"]
    predicted = (
        F.when((en >= de) & (en >= es) & (en > 0), "en")
         .when((de >= es) & (de > 0), "de")
         .when(es > 0, "es")
         .otherwise("und")
    )
    return docs.select(
        "doc_id", "lang",
        en.alias("en_score"), de.alias("de_score"), es.alias("es_score"),
        predicted.alias("predicted_lang"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score in [0,1]: length saturation, low-stopword
    bonus, lexical diversity — the usual pretraining-filter shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    stop_ratio = _count_in(toks, STOPWORDS) / n_tokens
    score = (
        F.lit(0.35) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + F.lit(0.35) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.30) * (n_distinct / n_tokens)
    )
    return docs.select(
        "doc_id",
        roundn_col(score).alias("quality"),
        (roundn_col(score) >= 0.5).alias("is_quality"),
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish regex pieces
    (letter runs / digit runs / single punctuation)."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.lower("text"), F.lit(PIECE_RE), F.lit(0))
    n_pieces = F.size(pieces).cast("long")
    return docs.select(
        "doc_id",
        F.size(_toks()).cast("long").alias("n_ws_tokens"),
        n_pieces.alias("n_pieces"),
        roundn_col(F.length("text") / n_pieces).alias("chars_per_piece"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined document fingerprint: md5 over the sorted distinct
    token set — identical wording permutations collapse to one fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.array_join(F.sort_array(F.array_distinct(_toks())), " ")
    return docs.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.size(F.array_distinct(_toks())).cast("long").alias("n_distinct_tokens"),
    )


VOCAB_TOP = 100


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by document frequency and total
    count. The canonical explode -> partial-agg shuffle: counts combine
    map-side, so the shuffle carries one row per distinct token per
    partition — not one per occurrence. Deterministic tiebreak on the
    token itself."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select("doc_id", F.explode(_toks()).alias("token"))
               .groupBy("token")
               .agg(F.count(F.lit(1)).alias("n_total"),
                    F.countDistinct("doc_id").alias("n_docs")))
    # Two-phase top-k: the vocabulary can be 1e8 tokens at 100 TB, so never
    # rank it through a global window. orderBy().limit() plans as
    # TakeOrderedAndProject (parallel per-partition top-100); the rank column
    # is rebuilt on the 100 survivors.
    top = tok.orderBy(F.col("n_total").desc(), F.col("token")).limit(VOCAB_TOP)
    w = Window.orderBy(F.col("n_total").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


TFIDF_TOP = 3


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: tf = count/doc_len, idf =
    ln(N/df). Two partial-agg shuffles (term counts per doc, df per term)
    plus a broadcast of the (small) df relation back onto the term rows;
    the per-doc rank shuffles on doc_id only."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # N rides in as a broadcast 1-row aggregate (pruned count-only scan) —
    # one plan, no separate driver-side count() job per tick.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    # Tokenize ONCE into a named column before exploding: an expensive
    # expression sharing a select with explode() lands in the projection
    # above Generate and re-evaluates per EXPLODED row (~doc_len regex
    # tokenizations per document — measured 5x on this query at sf1).
    arr = docs.select("doc_id", _toks().alias("toks"))
    tok = arr.select("doc_id", F.explode("toks").alias("token"),
                     F.size("toks").alias("doc_len"))
    tf = (tok.groupBy("doc_id", "token")
             .agg(F.count(F.lit(1)).alias("n"), F.first("doc_len").alias("doc_len")))
    df_rel = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(F.broadcast(df_rel), "token")
                .crossJoin(F.broadcast(n_docs))
                .withColumn("tfidf", roundn_col(
                    (F.col("n") / F.col("doc_len"))
                    * F.log(F.col("n_docs") / F.col("df")))))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= TFIDF_TOP)
                  .select("doc_id", "token", "tfidf", "rank"))


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality signal: mean unigram log-probability per
    document under the corpus's own unigram LM (add-one smoothed). The
    classic pretraining filter shape: one explode→count pass builds the LM
    (vocab-sized, broadcast back), one pass scores — the fact table
    shuffles only on doc_id for the mean."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_toks()).alias("token"))
    # the LM is VOCAB-sized (distinct tokens) — persist it so the 1-row
    # totals aggregate reads it back instead of re-tokenizing the whole
    # corpus (r12: 3 tokenize passes -> 2; same bounded-relation class
    # as the broadcast the scoring join already ships)
    freq = (tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    totals = freq.agg(F.sum("cnt").alias("total"),
                      F.count(F.lit(1)).alias("vocab"))
    logp = F.log((F.col("cnt") + 1.0)
                 / (F.col("total") + F.col("vocab")).cast("double"))
    return (
        tok.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.avg(logp).alias("alp"))
        .select("doc_id", "n_tokens",
                roundn_col(F.col("alp")).alias("avg_logprob"))
    )


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality signal: mean add-one-smoothed conditional bigram
    log-probability ``ln((c(w1,w2)+1)/(c(w1)+V))`` per document — the next
    step up from ``q_unigram_logprob`` toward the KenLM-style perplexity
    filters pretraining pipelines run.

    Shape: one (doc_id, w1, w2) gram relation feeds everything — each
    token row carries its successor (``F.get`` past the array end is a
    null — the end-of-document sentinel), so unigram counts c(w1), the
    vocab total, bigram counts c(w1,w2) AND the scoring join all derive
    from the same expression. The relation is RECOMPUTED per consumer,
    not checkpointed: an earlier ``localCheckpoint`` of the corpus-sized
    grams measured BIMODAL at sf1 — 4.2 s warm-best but 17-48 s whenever
    the session's block manager carried pressure from earlier queries
    (the eager materialization pins executor memory until GC), while the
    recompute is a flat ~9 s in every condition. Predictable linear
    tokenize work beats a corpus-sized block-manager residency — the
    same reasoning that keeps 100 TB checkpoints off executor storage.
    The bigram count table is corpus-sized so it hash-joins on (w1, w2),
    while the vocab-sized unigram counts and the 1-row vocab total
    broadcast. One doc_id shuffle for the mean.

    ``fanout=True``: the gram build is CPU-bound map-side work stuck
    behind the fixture's single-row-group layout (one scan task);
    fanning to defaultParallelism measured 17.7 s -> 4.4 s at sf0.1.
    On real multi-split inputs the repartition is dwarfed by the
    explode fan-out it feeds."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    # Materialize the token array as an ATTRIBUTE before the lambda: a
    # computed split() captured inside transform() re-evaluates per
    # element — O(tokens²) per doc (the SPARK-36715 pathology class,
    # measured 20× in the classifier; same staged-projection fix as
    # curation.py / retrieval.py).
    toked = docs.select("doc_id", _toks().alias("toks"))
    toks = F.col("toks")
    # (w1 = token at i, w2 = token at i+1 or null): one row per token
    # occurrence — the unigram AND bigram fact table in one explode.
    grams = F.transform(F.sequence(F.lit(0), F.size(toks) - 1),
                        lambda i: F.struct(F.get(toks, i).alias("w1"),
                                           F.get(toks, i + 1).alias("w2")))
    # The CORPUS-sized grams relation is still recomputed per consumer,
    # not checkpointed — see the docstring — but r12 cut the consumers
    # from four tokenize passes to TWO (guide §2.4): the bigram count
    # attaches as a count() WINDOW riding the (w1, w2) shuffle the
    # scoring join needed anyway (the old corpus-sized bfreq aggregate +
    # join-back recomputed the grams a third time just to re-attach a
    # group count — count-over-partition is identical, O(1) window
    # state); and the VOCAB-sized ufreq persists so the 1-row vocab
    # total reads it back instead of re-tokenizing the corpus a fourth
    # time (bounded relation — the scoring join broadcasts it anyway).
    from pyspark import StorageLevel
    from pyspark.sql import Window

    occ = (toked.select("doc_id", F.explode(grams).alias("bg"))
           .select("doc_id", F.col("bg.w1").alias("w1"),
                   F.col("bg.w2").alias("w2")))
    ufreq = (occ.groupBy("w1").agg(F.count(F.lit(1)).alias("ucnt"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    vocab = ufreq.agg(F.count(F.lit(1)).alias("vocab"))
    pairs = occ.filter(F.col("w2").isNotNull())
    wbg = Window.partitionBy("w1", "w2")
    counted = pairs.withColumn("bcnt", F.count(F.lit(1)).over(wbg))
    logp = F.log((F.col("bcnt") + 1.0)
                 / (F.col("ucnt") + F.col("vocab")).cast("double"))
    return (
        counted
        .join(F.broadcast(ufreq), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.avg(logp).alias("alp"))
        .select("doc_id", "n_bigrams",
                roundn_col(F.col("alp")).alias("avg_logprob"))
    )


QUERIES = {
    "q_vocab": q_vocab,
    "q_tfidf": q_tfidf,
    "q_unigram_logprob": q_unigram_logprob,
    "q_bigram_logprob": q_bigram_logprob,
    "q_text_stats": q_text_stats,
    "q_tokenize": q_tokenize,
    "q_lang_id": q_lang_id,
    "q_quality_score": q_quality_score,
    "q_token_count": q_token_count,
    "q_fingerprint": q_fingerprint,
}

_STOP_CNT = _sql_count_in(STOPWORDS)
_EN = _sql_count_in(LEXICONS["en"])
_DE = _sql_count_in(LEXICONS["de"])
_ES = _sql_count_in(LEXICONS["es"])

ORACLES = {
    "q_tfidf": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         len(string_split(text, ' ')) AS doc_len
  FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS n, any_value(doc_len) AS doc_len
  FROM tok GROUP BY doc_id, token),
dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token,
         {roundn_sql('(tf.n::DOUBLE / tf.doc_len) * ln((SELECT count(*) FROM documents)::DOUBLE / dfr.df)')} AS tfidf
  FROM tf JOIN dfr USING (token)),
ranked AS (
  SELECT doc_id, token, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, token) AS BIGINT) AS rank
  FROM scored)
SELECT * FROM ranked WHERE rank <= {TFIDF_TOP}""",

    "q_vocab": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
agg AS (
  SELECT token, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
  FROM tok GROUP BY token),
ranked AS (
  SELECT token, n_total, n_docs,
         CAST(row_number() OVER (ORDER BY n_total DESC, token) AS BIGINT) AS rank
  FROM agg)
SELECT * FROM ranked WHERE rank <= {VOCAB_TOP}""",

    "q_unigram_logprob": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
t AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM freq)
SELECT tok.doc_id, count(*) AS n_tokens,
       {roundn_sql('avg(ln((freq.cnt + 1.0) / (t.total + t.vocab)))')}
         AS avg_logprob
FROM tok JOIN freq USING (token) CROSS JOIN t
GROUP BY tok.doc_id""",

    "q_bigram_logprob": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
                   i -> {'w1': toks[i + 1], 'w2': toks[i + 2]})) AS b
  FROM t WHERE len(toks) >= 2),
p AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
uf AS (SELECT token, count(*) AS ucnt FROM tok GROUP BY token),
v AS (SELECT count(*) AS vocab FROM uf),
bf AS (SELECT w1, w2, count(*) AS bcnt FROM p GROUP BY w1, w2)
SELECT p.doc_id, count(*) AS n_bigrams,
       ROUNDN_BLP AS avg_logprob
FROM p JOIN bf USING (w1, w2) JOIN uf ON p.w1 = uf.token CROSS JOIN v
GROUP BY p.doc_id""",

    "q_text_stats": f"""
WITH t AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
         {_STOP_CNT} AS stop_cnt
  FROM documents)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       n_tokens, n_distinct_tokens,
       ROUNDN_ATL AS avg_token_len,
       ROUNDN_SR AS stopword_ratio
FROM t""",

    "q_tokenize": """
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token""",

    "q_lang_id": f"""
WITH s AS (
  SELECT doc_id, lang, {_EN} AS en_score, {_DE} AS de_score, {_ES} AS es_score
  FROM documents)
SELECT doc_id, lang, en_score, de_score, es_score,
       CASE WHEN en_score >= de_score AND en_score >= es_score AND en_score > 0 THEN 'en'
            WHEN de_score >= es_score AND de_score > 0 THEN 'de'
            WHEN es_score > 0 THEN 'es'
            ELSE 'und' END AS predicted_lang
FROM s""",

    "q_quality_score": f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
         {_STOP_CNT} AS stop_cnt
  FROM documents),
s AS (
  SELECT doc_id,
         ROUNDN_Q AS quality
  FROM t)
SELECT doc_id, quality, quality >= 0.5 AS is_quality FROM s""",

    "q_token_count": f"""
WITH t AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(lower(text), '{PIECE_RE}')) AS BIGINT) AS n_pieces
  FROM documents)
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       n_pieces,
       ROUNDN_CPP AS chars_per_piece
FROM t""",

    "q_fingerprint": """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens
FROM documents""",
}

_ATL = roundn_sql("length(replace(text, ' ', '')) / n_tokens")
_SR = roundn_sql("stop_cnt / n_tokens")
_Q = roundn_sql("0.35::DOUBLE * least(1.0::DOUBLE, n_tokens / 100.0::DOUBLE)"
                " + 0.35::DOUBLE * (1.0::DOUBLE - stop_cnt / n_tokens)"
                " + 0.30::DOUBLE * (n_distinct / n_tokens)")
_CPP = roundn_sql("length(text) / n_pieces")
_BLP = roundn_sql("avg(ln((bf.bcnt + 1.0) / (uf.ucnt + v.vocab)))")

for _k in list(ORACLES):
    ORACLES[_k] = (ORACLES[_k].replace("ROUNDN_ATL", _ATL).replace("ROUNDN_SR", _SR)
                   .replace("ROUNDN_Q", _Q).replace("ROUNDN_CPP", _CPP)
                   .replace("ROUNDN_BLP", _BLP))
