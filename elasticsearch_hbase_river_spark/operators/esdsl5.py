"""ES query-DSL pack 5: intervals / simple_query_string / combined_fields
and the remaining suggest, categorization and multi-search surfaces.

The reference makes HBase rows searchable through the full ES DSL
(`HBaseRiver.java:1-35`); packs 1-4 cover scoring, joins, geo, stats,
span/regexp/query-string and the bucket/pipeline families. This pack
closes the published shapes that remained:

Full-text / term-level:
- ``q_intervals``            : ES ``intervals`` query (``match`` rule,
  ``ordered: true, max_gaps: N``) — ordered co-occurrence of two terms
  within a bounded gap, from the positional postings.
- ``q_simple_query_string``  : ES ``simple_query_string`` — ``+`` (AND),
  ``|`` (OR) and ``-`` (NOT) operators parsed driver-side into
  OR-of-AND groups; a document matches if any group is satisfied.
- ``q_match_bool_prefix``    : ES ``match_bool_prefix`` — every term a
  bool *should* clause, the last term matched as a prefix.
- ``q_combined_fields``      : ES ``combined_fields`` — term-centric
  multi-field scoring over ONE synthetic combined field: weighted field
  term frequencies and lengths merged before BM25 (vs ``multi_match``'s
  per-field scores, `multifield.py`).
- ``q_constant_score``       : ES ``constant_score`` — filter context
  (term + length predicate), every hit scored by the constant boost.
- ``q_span_containing``      : ES ``span_containing`` — matches of the
  *big* span (ordered two-term near) that contain a *little* span (a
  third term strictly inside).

Suggest / categorize:
- ``q_completion_suggest``   : ES completion suggester — prefix-matched
  suggestions ordered by weight (document frequency), top-k.
- ``q_categorize_text``      : ES ``categorize_text`` agg — collapse
  semi-structured event messages into categories by masking the numeric
  tokens, bucket counts + an example document.

Aggregations:
- ``q_variable_width_histogram`` : ES ``variable_width_histogram`` —
  equal-population value buckets from exact quantile boundaries (ES's
  streaming clusterer is approximate and seed-dependent; the
  deterministic twin uses the quantile cut points, the same
  interpolation both engines share via ``q_value_quantiles``).
- ``q_cumulative_cardinality``   : ES ``cumulative_cardinality``
  pipeline agg — per-day NEW distinct users and the running total of
  distinct users ever seen (exact: first-appearance day per user).
- ``q_bucket_script``            : ES ``bucket_script`` pipeline agg —
  per-day error rate computed from two sibling metrics of the same
  date_histogram.

Multi-search:
- ``q_msearch``          : ES ``_msearch`` — N independent term queries
  answered in ONE shared corpus pass: postings filtered to the union of
  the query terms, per-query BM25-saturated scoring, top-k per query.
- ``q_msearch_indexed``  : the same bundle served from the persistent
  inverted index (`indexed_search.py`): tf from the pruned postings
  buckets, df from the vocab sidecar, corpus stats driver-side — zero
  tokenization at query time.

Scale shapes: every aggregation is one partial-agg shuffle; pipeline
aggs window over the BUCKET relation (days — thousands of rows at
100 TB). All span/interval joins are per-term position lists with the
term filter below the join. ``q_msearch`` is the scale argument for
batching: Q queries share one postings scan and one (token, doc)
aggregation instead of Q scans — the union term filter stays map-side,
and per-query ranking windows partition BY QUERY, never globally.
``q_variable_width_histogram``'s boundary relation is ONE row broadcast
into a map-side bucket assignment (the corpus is never sorted).
``q_combined_fields`` merges field statistics per (doc, term) BEFORE
scoring, so the join graph is the same posting-sized term-filtered
funnel as ``multi_match`` with one fewer per-field branch.

All float outputs go through the portable ``floor(x*1eN+0.5)/1eN``
rounding (`functions/determinism.py`); per-doc score sums add at most
two IEEE doubles (commutative), and decimal accumulators feed every
corpus-sized average.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.analyzer import (
    ANALYZE_TOKS_SQL,
    analyze_tokens,
)
from elasticsearch_hbase_river_spark.functions.determinism import (
    roundn_col,
    roundn_sql,
)
from elasticsearch_hbase_river_spark.operators.esagg import DAY_MS
from elasticsearch_hbase_river_spark.operators.multifield import (
    MM_BOOSTS,
    TITLE_LEN,
    _field_dl,
    _field_tf,
    _ranked_topk,
)
from elasticsearch_hbase_river_spark.operators.search import (
    _POSTINGS_SQL,
    BM25_B,
    BM25_K1,
    _postings,
)
from elasticsearch_hbase_river_spark.sources.tables import (
    load_events,
    load_table,
)

QUERIES: dict = {}
ORACLES: dict = {}

# ---------------------------------------------------------------------------
# intervals — ordered match with bounded gaps.

INTERVALS = ("scan", "merge", 3)   # first term, second term, max_gaps


def q_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``intervals`` query, ``match`` rule with ``ordered: true,
    max_gaps: {INTERVALS[2]}``: occurrences of {INTERVALS[0]!r} followed
    by {INTERVALS[1]!r} with at most {INTERVALS[2]} tokens between them.
    Pair-based relaxation of Lucene's minimal-interval semantics: every
    ordered in-gap pair counts (the oracle mirrors the same definition).
    Both sides are single-term position lists — the term filters sit
    below the doc_id equi-join, so the joined sides are posting-sized."""
    p = _postings(load_table(spark, sf_dir, "documents"))
    a = (p.filter(F.col("token") == INTERVALS[0])
         .select("doc_id", F.col("pos").alias("pos_a")))
    b = (p.filter(F.col("token") == INTERVALS[1])
         .select("doc_id", F.col("pos").alias("pos_b")))
    gap = F.col("pos_b") - F.col("pos_a") - 1
    return (a.join(b, "doc_id")
            .filter((F.col("pos_b") > F.col("pos_a"))
                    & (gap <= INTERVALS[2]))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.min(F.col("pos_b") - F.col("pos_a") + 1)
                 .alias("min_width")))


ORACLES["q_intervals"] = f"""
WITH tok AS ({_POSTINGS_SQL}),
a AS (SELECT doc_id, pos AS pos_a FROM tok WHERE token = '{INTERVALS[0]}'),
b AS (SELECT doc_id, pos AS pos_b FROM tok WHERE token = '{INTERVALS[1]}')
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_intervals,
       min(pos_b - pos_a + 1) AS min_width
FROM a JOIN b USING (doc_id)
WHERE pos_b > pos_a AND pos_b - pos_a - 1 <= {INTERVALS[2]}
GROUP BY doc_id"""

# ---------------------------------------------------------------------------
# simple_query_string — +/|/- operators, OR-of-AND groups.

SQS_QUERY = "scan + merge | batch + -dup"


def _parse_simple_query_string(qs: str) -> list[tuple[list, list]]:
    """Parse the simple_query_string operator subset into OR-of-AND
    groups: ``|`` separates groups, ``+`` conjoins within a group (the
    group is a conjunction already, so ``+`` tokens are connectors),
    ``-term`` negates within its group. Pure driver-side string work on
    the query literal. Unsupported syntax (phrases, ``*``, fields)
    raises rather than silently degrading."""
    groups: list[tuple[list, list]] = []
    for raw_group in qs.split("|"):
        pos: list = []
        neg: list = []
        for tok in raw_group.split():
            if tok == "+":
                continue
            m = re.fullmatch(r"(-?)([a-z0-9]+)", tok)
            if not m:
                raise ValueError(
                    f"unsupported simple_query_string clause: {tok!r}")
            (neg if m.group(1) else pos).append(m.group(2))
        if not pos:
            raise ValueError("each group needs at least one positive term")
        groups.append((pos, neg))
    return groups


def q_simple_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``simple_query_string`` over {SQS_QUERY!r}: a document matches
    if ANY ``|``-group is satisfied (all its positive terms present, no
    negated term present); score = the number of positive terms of the
    satisfied groups (coord-style, like ``q_query_string``). One
    distinct doc-term containment pass filtered map-side to the query's
    term union, then per-doc flags — the flag relation is one row per
    matching doc."""
    groups = _parse_simple_query_string(SQS_QUERY)
    terms = sorted({t for pos, neg in groups for t in pos + neg})
    p = (_postings(load_table(spark, sf_dir, "documents"))
         .filter(F.col("token").isin(*terms))
         .select("doc_id", "token").distinct())
    flags = p.groupBy("doc_id").agg(
        *[F.max(F.when(F.col("token") == t, 1).otherwise(0))
          .alias(f"has_{t}") for t in terms])
    group_cols = []
    for pos, neg in groups:
        cond = F.lit(True)
        for t in pos:
            cond = cond & (F.col(f"has_{t}") == 1)
        for t in neg:
            cond = cond & (F.col(f"has_{t}") == 0)
        group_cols.append((cond, len(pos)))
    n_groups = sum(
        (F.when(c, 1).otherwise(0) for c, _ in group_cols), F.lit(0))
    score = sum(
        (F.when(c, npos).otherwise(0) for c, npos in group_cols), F.lit(0))
    return (flags.select("doc_id",
                         n_groups.cast("long").alias("n_groups"),
                         score.cast("long").alias("score"))
            .filter(F.col("n_groups") >= 1))


def _sqs_oracle() -> str:
    groups = _parse_simple_query_string(SQS_QUERY)
    terms = sorted({t for pos, neg in groups for t in pos + neg})
    in_list = ", ".join(f"'{t}'" for t in terms)
    flag_sql = ", ".join(
        f"max(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS has_{t}"
        for t in terms)
    conds = []
    for pos, neg in groups:
        c = " AND ".join([f"has_{t} = 1" for t in pos]
                         + [f"has_{t} = 0" for t in neg])
        conds.append((c, len(pos)))
    n_groups = " + ".join(f"(CASE WHEN {c} THEN 1 ELSE 0 END)"
                          for c, _ in conds)
    score = " + ".join(f"(CASE WHEN {c} THEN {npos} ELSE 0 END)"
                       for c, npos in conds)
    return f"""
WITH tok AS ({_POSTINGS_SQL}),
flags AS (
  SELECT doc_id, {flag_sql}
  FROM (SELECT DISTINCT doc_id, token FROM tok
        WHERE token IN ({in_list}))
  GROUP BY doc_id)
SELECT doc_id, CAST({n_groups} AS BIGINT) AS n_groups,
       CAST({score} AS BIGINT) AS score
FROM flags WHERE {n_groups} >= 1"""


ORACLES["q_simple_query_string"] = _sqs_oracle()

# ---------------------------------------------------------------------------
# match_bool_prefix — terms as should clauses, last term as prefix.

MBP_TERMS = ("slow", "wind")   # full term clause, prefix clause


def q_match_bool_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``match_bool_prefix`` for {MBP_TERMS!r}: bool *should* over a
    term clause for {MBP_TERMS[0]!r} and a prefix clause
    {MBP_TERMS[1]!r}*; a doc matches with ≥ 1 clause. One postings pass
    with the clause filter map-side (term equality OR prefix), then a
    per-doc flag aggregation."""
    p = _postings(load_table(spark, sf_dir, "documents"))
    hit = p.filter((F.col("token") == MBP_TERMS[0])
                   | F.col("token").startswith(MBP_TERMS[1]))
    is_pfx = F.col("token").startswith(MBP_TERMS[1])
    return (hit.groupBy("doc_id")
            .agg((F.max(F.when(F.col("token") == MBP_TERMS[0], 1)
                        .otherwise(0))
                  + F.max(F.when(is_pfx, 1).otherwise(0)))
                 .cast("long").alias("n_clauses"),
                 F.min(F.when(is_pfx, F.col("token")))
                 .alias("first_expansion")))


ORACLES["q_match_bool_prefix"] = f"""
WITH tok AS ({_POSTINGS_SQL})
SELECT doc_id,
       CAST(max(CASE WHEN token = '{MBP_TERMS[0]}' THEN 1 ELSE 0 END)
            + max(CASE WHEN token LIKE '{MBP_TERMS[1]}%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clauses,
       min(CASE WHEN token LIKE '{MBP_TERMS[1]}%' THEN token END)
           AS first_expansion
FROM tok
WHERE token = '{MBP_TERMS[0]}' OR token LIKE '{MBP_TERMS[1]}%'
GROUP BY doc_id"""

# ---------------------------------------------------------------------------
# combined_fields — one synthetic combined field, weighted tf/dl merge.

CF_TERMS = ("stream", "sort")
CF_TOP = 10


def q_combined_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``combined_fields`` over title^{MM_BOOSTS['title']}/body for
    {CF_TERMS!r}: per-field term frequencies and lengths are merged into
    ONE synthetic field BEFORE scoring — ``tf' = Σ_f w_f·tf_f``,
    ``dl' = Σ_f w_f·dl_f`` — then plain BM25 with the combined
    statistics (df = docs containing the term in ANY field, N = docs
    with the combined field). This is the term-centric alternative to
    ``multi_match`` (`multifield.py`), which scores per field and blends
    afterwards. The funnel is the same posting-sized term-filtered join
    graph with ONE scoring branch."""
    tf = _field_tf(spark, sf_dir, CF_TERMS)       # (doc_id, field, token, tf)
    fdl = _field_dl(spark, sf_dir)                # (doc_id, field, dl)
    boost = (F.when(F.col("field") == "title",
                    F.lit(MM_BOOSTS["title"]))
             .otherwise(F.lit(MM_BOOSTS["body"])))
    ctf = (tf.select("doc_id", "token", (boost * F.col("tf")).alias("wtf"))
           .groupBy("doc_id", "token")
           .agg(F.sum("wtf").alias("ctf")))       # ≤ 2 addends per group
    cdl = (fdl.select("doc_id", (boost * F.col("dl")).alias("wdl"))
           .groupBy("doc_id")
           .agg(F.sum(F.col("wdl").cast("decimal(18,2)")).alias("cdl_dec")))
    stats = cdl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("cdl_dec").cast("double")
         / F.count(F.lit(1))).alias("avgdl"))
    df_ = ctf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    scored = (ctf.join(F.broadcast(df_), "token")
              .join(cdl, "doc_id")
              .join(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    cdl_d = F.col("cdl_dec").cast("double")
    tfnorm = (F.col("ctf") * (BM25_K1 + 1)) / (
        F.col("ctf") + BM25_K1 * (1 - BM25_B + BM25_B * cdl_d / F.col("avgdl")))
    per_doc = (scored.select("doc_id", (idf * tfnorm).alias("c"))
               .groupBy("doc_id")
               .agg(F.sum("c").alias("raw")))     # ≤ 2 addends per doc
    return _ranked_topk(
        per_doc.select("doc_id", roundn_col(F.col("raw")).alias("score")),
        CF_TOP)


_CF_TERMS_SQL = ", ".join(f"'{t}'" for t in CF_TERMS)
_CF_BOOST_SQL = (f"CASE WHEN field = 'title' THEN {MM_BOOSTS['title']!r}"
                 f" ELSE {MM_BOOSTS['body']!r} END")

ORACLES["q_combined_fields"] = f"""
WITH toks AS (SELECT doc_id, {ANALYZE_TOKS_SQL} AS toks FROM documents),
fdl AS (
  SELECT doc_id, 'title' AS field,
         CAST(least(len(toks), {TITLE_LEN}) AS BIGINT) AS dl
  FROM toks WHERE len(toks) > 0
  UNION ALL
  SELECT doc_id, 'body', CAST(len(toks) - {TITLE_LEN} AS BIGINT)
  FROM toks WHERE len(toks) > {TITLE_LEN}),
occ AS (
  SELECT doc_id, unnest(toks) AS token,
         CAST(unnest(range(len(toks))) AS BIGINT) AS pos
  FROM toks),
ftf AS (
  SELECT doc_id,
         CASE WHEN pos < {TITLE_LEN} THEN 'title' ELSE 'body' END AS field,
         token, CAST(count(*) AS BIGINT) AS tf
  FROM occ WHERE token IN ({_CF_TERMS_SQL})
  GROUP BY 1, 2, 3),
ctf AS (
  SELECT doc_id, token, sum(({_CF_BOOST_SQL}) * tf) AS ctf
  FROM ftf GROUP BY doc_id, token),
cdl AS (
  SELECT doc_id,
         sum(CAST(({_CF_BOOST_SQL}) * dl AS DECIMAL(18,2))) AS cdl_dec
  FROM fdl GROUP BY doc_id),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(cdl_dec) AS DOUBLE) / count(*) AS avgdl
  FROM cdl),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM ctf
        GROUP BY token),
per_doc AS (
  SELECT ctf.doc_id,
         sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (ctf * ({BM25_K1} + 1))
               / (ctf + {BM25_K1} * (1 - {BM25_B}
                  + {BM25_B} * CAST(cdl_dec AS DOUBLE) / avgdl))) AS raw
  FROM ctf JOIN dfr USING (token) JOIN cdl USING (doc_id)
  CROSS JOIN stats
  GROUP BY ctf.doc_id)
SELECT doc_id, {roundn_sql('raw')} AS score,
       CAST(row_number() OVER (ORDER BY {roundn_sql('raw')} DESC, doc_id)
            AS BIGINT) AS rank
FROM per_doc
ORDER BY score DESC, doc_id LIMIT {CF_TOP}"""

# ---------------------------------------------------------------------------
# constant_score — filter context, constant boost.

CS_TERM = "dup"
CS_MIN_DL = 25
CS_BOOST = 1.2


def q_constant_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``constant_score`` wrapping a bool FILTER (term {CS_TERM!r}
    present AND analyzed length ≥ {CS_MIN_DL}): every hit scores the
    constant boost {CS_BOOST} — scoring is bypassed entirely, which is
    the point of the filter context. Pure map-side predicate on the
    corpus scan: no shuffle anywhere in this plan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = analyze_tokens(F.col("text"))
    return (docs.select("doc_id", F.size(toks).cast("long").alias("dl"),
                        F.array_contains(toks, CS_TERM).alias("has_term"))
            .filter(F.col("has_term") & (F.col("dl") >= CS_MIN_DL))
            .select("doc_id", "dl",
                    roundn_col(F.lit(CS_BOOST)).alias("score")))


ORACLES["q_constant_score"] = f"""
WITH toks AS (SELECT doc_id, {ANALYZE_TOKS_SQL} AS toks FROM documents)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       {roundn_sql(str(CS_BOOST))} AS score
FROM toks
WHERE list_contains(toks, '{CS_TERM}') AND len(toks) >= {CS_MIN_DL}"""

# ---------------------------------------------------------------------------
# span_containing — big span (ordered near) containing a little span.

SPAN_BIG = ("group", "sort", 6)   # first, second, max in-between slop
SPAN_LITTLE = "value"


def q_span_containing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``span_containing``: *big* spans ({SPAN_BIG[0]!r} …
    {SPAN_BIG[1]!r}, ordered, ≤ {SPAN_BIG[2]} tokens between) that
    contain a {SPAN_LITTLE!r} occurrence strictly inside. All three
    sides are single-term position lists (term filters below the
    joins); pair volume per doc is bounded by tf products of three
    specific terms."""
    p = _postings(load_table(spark, sf_dir, "documents"))
    g = (p.filter(F.col("token") == SPAN_BIG[0])
         .select("doc_id", F.col("pos").alias("pos_g")))
    s = (p.filter(F.col("token") == SPAN_BIG[1])
         .select("doc_id", F.col("pos").alias("pos_s")))
    v = (p.filter(F.col("token") == SPAN_LITTLE)
         .select("doc_id", F.col("pos").alias("pos_v")))
    spans = (g.join(s, "doc_id")
             .filter((F.col("pos_s") > F.col("pos_g"))
                     & (F.col("pos_s") - F.col("pos_g") - 1 <= SPAN_BIG[2])))
    containing = (spans.join(v, "doc_id")
                  .filter((F.col("pos_v") > F.col("pos_g"))
                          & (F.col("pos_v") < F.col("pos_s")))
                  .select("doc_id", "pos_g", "pos_s").distinct())
    return (containing.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.min(F.col("pos_s") - F.col("pos_g") + 1)
                 .alias("min_width")))


ORACLES["q_span_containing"] = f"""
WITH tok AS ({_POSTINGS_SQL}),
g AS (SELECT doc_id, pos AS pos_g FROM tok WHERE token = '{SPAN_BIG[0]}'),
s AS (SELECT doc_id, pos AS pos_s FROM tok WHERE token = '{SPAN_BIG[1]}'),
v AS (SELECT doc_id, pos AS pos_v FROM tok WHERE token = '{SPAN_LITTLE}'),
containing AS (
  SELECT DISTINCT g.doc_id, pos_g, pos_s
  FROM g JOIN s ON g.doc_id = s.doc_id
  JOIN v ON v.doc_id = g.doc_id
  WHERE pos_s > pos_g AND pos_s - pos_g - 1 <= {SPAN_BIG[2]}
    AND pos_v > pos_g AND pos_v < pos_s)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       min(pos_s - pos_g + 1) AS min_width
FROM containing GROUP BY doc_id"""

# ---------------------------------------------------------------------------
# completion suggester — weight-ordered prefix completion.

COMPLETE_PREFIX = "s"
COMPLETE_TOP = 5


def q_completion_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester: suggestions = the analyzed vocabulary
    weighted by document frequency; prefix {COMPLETE_PREFIX!r} returns
    the top-{COMPLETE_TOP} completions by (weight desc, term asc). The
    prefix filter prunes BEFORE the df aggregation (map-side), so the
    shuffle carries only the matching terms' rows; production serving
    reads the vocab sidecar of the persistent index instead
    (`q_suggest_indexed` is that twin for the term suggester)."""
    p = (_postings(load_table(spark, sf_dir, "documents"))
         .filter(F.col("token").startswith(COMPLETE_PREFIX))
         .select("doc_id", "token").distinct())
    dfr = p.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("weight"))
    top = dfr.orderBy(F.col("weight").desc(), "token").limit(COMPLETE_TOP)
    w = Window.orderBy(F.col("weight").desc(), "token")
    return top.select(F.row_number().over(w).cast("long").alias("rank"),
                      "token", "weight")


ORACLES["q_completion_suggest"] = f"""
WITH tok AS ({_POSTINGS_SQL}),
dfr AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS weight
  FROM tok WHERE token LIKE '{COMPLETE_PREFIX}%' GROUP BY token)
SELECT CAST(row_number() OVER (ORDER BY weight DESC, token) AS BIGINT)
         AS rank,
       token, weight
FROM dfr ORDER BY weight DESC, token LIMIT {COMPLETE_TOP}"""

# ---------------------------------------------------------------------------
# categorize_text — numeric-masked message categories.

CAT_MASK_RE = "[0-9]+"


def q_categorize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``categorize_text`` agg over the event stream's semi-structured
    messages: the category key is the event type plus its props with
    every number masked to ``#`` (ES's categorizer drops the variable
    parts of log messages; numeric masking is its deterministic core).
    One partial-agg shuffle; the bucket relation is pattern-count-sized
    (a handful of categories regardless of corpus size)."""
    ev = load_events(spark, sf_dir)
    cat = F.concat_ws(
        " ", F.col("event_type"),
        F.regexp_replace(F.col("props"), CAT_MASK_RE, "#"))
    return (ev.groupBy(cat.alias("category"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("event_id").alias("example_id")))


ORACLES["q_categorize_text"] = f"""
SELECT concat(event_type, ' ',
              regexp_replace(props, '{CAT_MASK_RE}', '#', 'g')) AS category,
       CAST(count(*) AS BIGINT) AS n_events,
       min(event_id) AS example_id
FROM events GROUP BY 1"""

# ---------------------------------------------------------------------------
# variable_width_histogram — equal-population buckets from exact quantiles.

VWH_BUCKETS = 8


def q_variable_width_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``variable_width_histogram`` with {VWH_BUCKETS} buckets over
    event values. ES's implementation is a streaming clusterer whose
    buckets depend on shard visit order; the deterministic twin derives
    the bucket BOUNDARIES from exact quantiles (the interpolation both
    engines already share, see ``q_value_quantiles``) and assigns
    buckets map-side by comparing against the 1-row boundary relation —
    the corpus is never globally sorted. Per-bucket count/min/max/mean,
    decimal-exact mean accumulation."""
    ev = load_events(spark, sf_dir)
    probs = [i / VWH_BUCKETS for i in range(1, VWH_BUCKETS)]
    bounds = ev.agg(F.expr(
        f"percentile(value, array({', '.join(map(repr, probs))}))")
        .alias("bs"))
    # Interpolated quantiles differ between engines in the LAST ULP
    # (measured: 51.87 vs 51.86999999999999 on the same sorted set), so
    # boundaries are snapped to the 6-dp grid in BOTH engines before any
    # value comparison — the snap is the portable floor(x*1e6+0.5)/1e6.
    bucket = sum(
        (F.when(F.col("value") > roundn_col(F.col("bs")[i]), 1).otherwise(0)
         for i in range(VWH_BUCKETS - 1)), F.lit(1))
    dec = F.col("value").cast("decimal(18,2)")
    return (ev.join(F.broadcast(bounds))
            .groupBy(bucket.cast("long").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("value").alias("vmin"),
                 F.max("value").alias("vmax"),
                 F.sum(dec).alias("vsum_dec"))
            .select("bucket", "n_events", "vmin", "vmax",
                    roundn_col(F.col("vsum_dec").cast("double")
                               / F.col("n_events")).alias("vavg")))


def _vwh_oracle() -> str:
    probs = [i / VWH_BUCKETS for i in range(1, VWH_BUCKETS)]
    qs = ", ".join(f"quantile_cont(value, {p!r}) AS b{i}"
                   for i, p in enumerate(probs))
    assign = " + ".join(
        f"(CASE WHEN value > {roundn_sql(f'b{i}')} THEN 1 ELSE 0 END)"
        for i in range(len(probs)))
    return f"""
WITH bnd AS (SELECT {qs} FROM events),
assigned AS (
  SELECT CAST(1 + {assign} AS BIGINT) AS bucket, value
  FROM events CROSS JOIN bnd)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
       min(value) AS vmin, max(value) AS vmax,
       {roundn_sql('CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)'
                   ' / count(*)')} AS vavg
FROM assigned GROUP BY bucket"""


ORACLES["q_variable_width_histogram"] = _vwh_oracle()

# ---------------------------------------------------------------------------
# cumulative_cardinality — running distinct-user total per day.

def q_cumulative_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline agg: per day, the number
    of users seen for the FIRST time and the running total of distinct
    users ever seen. Exact (ES's is HLL-approximate): first-appearance
    day per user is one keyed aggregation; the cumulative window then
    runs over the DAY relation — calendar-sized, thousands of rows at
    100 TB, never the corpus."""
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts_ms div {DAY_MS}")
    days = ev.select(day.alias("day_id")).distinct()
    firsts = (ev.groupBy("user_id")
              .agg(F.min(day).alias("day_id")))
    news = firsts.groupBy("day_id").agg(
        F.count(F.lit(1)).cast("long").alias("new_users"))
    w = (Window.orderBy("day_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (days.join(news, "day_id", "left")
            .select("day_id",
                    F.coalesce(F.col("new_users"), F.lit(0)).cast("long")
                    .alias("new_users"))
            .withColumn("cumulative_users",
                        F.sum("new_users").over(w).cast("long")))


ORACLES["q_cumulative_cardinality"] = f"""
WITH days AS (
  SELECT DISTINCT epoch_ms(ts) // {DAY_MS} AS day_id FROM events),
firsts AS (
  SELECT user_id, min(epoch_ms(ts) // {DAY_MS}) AS day_id
  FROM events GROUP BY user_id),
news AS (
  SELECT day_id, CAST(count(*) AS BIGINT) AS new_users
  FROM firsts GROUP BY day_id)
SELECT day_id, CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(new_users, 0)) OVER (
            ORDER BY day_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_users
FROM days LEFT JOIN news USING (day_id)"""

# ---------------------------------------------------------------------------
# bucket_script — sibling-metric ratio per bucket.

BS_ERROR_TYPE = "error"


def q_bucket_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: a per-day date_histogram with
    two sibling metrics (error count, total count) and a scripted third
    metric ``error_rate = errors / total`` computed FROM the buckets.
    One conditional partial-agg shuffle; the script runs on the
    day-sized bucket relation."""
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts_ms div {DAY_MS}")
    per = (ev.groupBy(day.alias("day_id"))
           .agg(F.sum(F.when(F.col("event_type") == BS_ERROR_TYPE, 1)
                      .otherwise(0)).cast("long").alias("n_errors"),
                F.count(F.lit(1)).cast("long").alias("n_total")))
    return per.select(
        "day_id", "n_errors", "n_total",
        roundn_col(F.col("n_errors").cast("double") / F.col("n_total"))
        .alias("error_rate"))


ORACLES["q_bucket_script"] = f"""
SELECT epoch_ms(ts) // {DAY_MS} AS day_id,
       CAST(sum(CASE WHEN event_type = '{BS_ERROR_TYPE}' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors,
       CAST(count(*) AS BIGINT) AS n_total,
       {roundn_sql(
           f"CAST(sum(CASE WHEN event_type = '{BS_ERROR_TYPE}'"
           " THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS error_rate
FROM events GROUP BY 1"""

# ---------------------------------------------------------------------------
# _msearch — N term queries, ONE corpus pass.

MSEARCH = (("q_dup", "dup"), ("q_spark", "spark"),
           ("q_vector", "vector"), ("q_window", "window"))
MS_TOP = 3


def _msearch_scored(tfs: DataFrame, dfr: DataFrame,
                    n_docs) -> DataFrame:
    """Shared scoring tail: BM25 idf × saturated tf (b=0 — no length
    norm, ES ``omit_norms`` semantics), per-query top-k by (score desc,
    doc_id). The ranking window partitions BY QUERY TERM — never a
    global sort."""
    idf = F.log(F.lit(1.0) + (n_docs - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    sat = (F.col("tf") * (BM25_K1 + 1)) / (F.col("tf") + BM25_K1)
    scored = (tfs.join(F.broadcast(dfr), "token")
              .select("token", "doc_id",
                      roundn_col(idf * sat).alias("score")))
    w = (Window.partitionBy("token")
         .orderBy(F.col("score").desc(), "doc_id"))
    qid = F.create_map(
        *[F.lit(x) for pair in MSEARCH for x in pair[::-1]])[F.col("token")]
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= MS_TOP)
            .select(qid.alias("query_id"), "doc_id", "rank", "score"))


def q_msearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_msearch``: {len(MSEARCH)} independent term queries answered
    in ONE shared corpus pass — postings filtered map-side to the UNION
    of the query terms, one (token, doc) aggregation, df piggybacked on
    the same relation, then per-query top-{MS_TOP}. The scale argument
    for batching: Q queries cost one scan + one keyed shuffle instead of
    Q of each; per-query ranking windows partition by query."""
    terms = tuple(t for _, t in MSEARCH)
    docs = load_table(spark, sf_dir, "documents")
    p = _postings(docs).filter(F.col("token").isin(*terms))
    tfs = p.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    dfr = tfs.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tfs_n = tfs.join(F.broadcast(n_docs))
    return _msearch_scored(tfs_n, dfr, F.col("n_docs"))


def q_msearch_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same ``_msearch`` bundle served from the persistent inverted
    index: tf comes straight from the terms' pruned postings buckets, df
    from the vocab sidecar, and N driver-side from the cached stats row
    — zero tokenization, zero corpus touch at query time."""
    from elasticsearch_hbase_river_spark.operators.indexed_search import (
        ensure_index,
        index_stats,
        read_postings,
        read_vocab,
    )
    terms = tuple(t for _, t in MSEARCH)
    idx = ensure_index(spark, sf_dir)
    tfs = (read_postings(spark, idx, terms)
           .select("token", "doc_id", F.col("tf").cast("long").alias("tf")))
    dfr = (read_vocab(spark, idx, terms)
           .select("token", F.col("df").cast("long").alias("df")))
    n_docs = F.lit(int(index_stats(idx)["n_docs"]))
    return _msearch_scored(tfs, dfr, n_docs)


_MS_TERMS_SQL = ", ".join(f"'{t}'" for _, t in MSEARCH)
_MS_QID_SQL = ("CASE " + " ".join(
    f"WHEN token = '{t}' THEN '{q}'" for q, t in MSEARCH) + " END")

_MSEARCH_ORACLE = f"""
WITH tok AS ({_POSTINGS_SQL}),
tfs AS (
  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ({_MS_TERMS_SQL})
  GROUP BY token, doc_id),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tfs
        GROUP BY token),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT token, doc_id,
         {roundn_sql(f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
                     f" * (tf * ({BM25_K1} + 1)) / (tf + {BM25_K1})")}
           AS score
  FROM tfs JOIN dfr USING (token) CROSS JOIN nd),
ranked AS (
  SELECT token, doc_id, score,
         CAST(row_number() OVER (
              PARTITION BY token ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
  FROM scored)
SELECT {_MS_QID_SQL} AS query_id, doc_id, rank, score
FROM ranked WHERE rank <= {MS_TOP}"""

ORACLES["q_msearch"] = _MSEARCH_ORACLE
ORACLES["q_msearch_indexed"] = _MSEARCH_ORACLE

# ---------------------------------------------------------------------------

QUERIES.update({
    "q_intervals": q_intervals,
    "q_simple_query_string": q_simple_query_string,
    "q_match_bool_prefix": q_match_bool_prefix,
    "q_combined_fields": q_combined_fields,
    "q_constant_score": q_constant_score,
    "q_span_containing": q_span_containing,
    "q_completion_suggest": q_completion_suggest,
    "q_categorize_text": q_categorize_text,
    "q_variable_width_histogram": q_variable_width_histogram,
    "q_cumulative_cardinality": q_cumulative_cardinality,
    "q_bucket_script": q_bucket_script,
    "q_msearch": q_msearch,
    "q_msearch_indexed": q_msearch_indexed,
})
