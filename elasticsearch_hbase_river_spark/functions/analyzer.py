"""The search-surface analyzer chain (ES ``standard``-analyzer minimum).

Elasticsearch never indexes raw text: the standard analyzer lowercases and
splits on non-alphanumeric boundaries before postings are built, and the
SAME analysis is applied to query terms — the first thing any user of a
term query hits on real text ("Spark," must match the term ``spark``).
The reference applies the field-NAME twin of this normalization
(lowercase + strip, `HBaseRiver.java:314-326`, pinned by
`HBaseRiverTest.java:37-47`); this module is the field-VALUE analog for
the engine's search surface (postings build, BM25/phrase/fuzzy/suggest,
the materialized index and its streaming maintainer).

The chain: lowercase → replace every non-[a-z0-9] run with one space →
trim → split. Pure JVM-side string expressions (whole-stage codegen, no
UDF), with a DuckDB SQL twin used verbatim inside every oracle so the
correctness gate proves both engines analyze identically
(tests/test_analyzer.py runs both over a deliberately dirty corpus).

Deliberately NOT applied outside the search surface: the dedup family
(shingles, winnowing), text statistics and pretrain curation define their
own tokenization — changing their semantics is not the analyzer's job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Token-boundary pattern: any run of characters outside [a-z0-9] (applied
#: AFTER lowercasing) is a separator. ES's standard analyzer is
#: Unicode-segmentation-based; for the a-z0-9 corpus this engine serves,
#: the boundary classes coincide, and the regex stays identical (and
#: cheap) in both engines.
TOKEN_SEP_RE = "[^a-z0-9]+"


#: Characters outside 7-bit ASCII — anything the analyzer would treat as a
#: separator even when it is a LETTER in the document's language.
_NON_ASCII_RE = "[^\\x00-\\x7F]"


def assert_ascii_corpus(df, col: str = "text") -> None:
    """Fail loudly on a corpus the analyzer cannot analyze faithfully.

    :data:`TOKEN_SEP_RE` treats every non-[a-z0-9] character as a
    separator, so non-ASCII letters (any real multilingual corpus) would
    silently degrade into split tokens — and every oracle mirrors the same
    approximation, so the correctness gate cannot catch it. The WHOLE
    corpus is checked (one distributed codegen'd regex filter with a
    1-row early-exit limit, no shuffle): a head-only sample would pass a
    corpus whose non-ASCII documents sit past the sampled row group and
    then mis-tokenize through a green gate — the exact failure this
    guard exists to prevent."""
    bad = (df.select(F.col(col).alias("_t"))
           .filter(F.col("_t").rlike(_NON_ASCII_RE)).limit(1).collect())
    if bad:
        snippet = bad[0][0][:80]
        raise ValueError(
            "corpus contains non-ASCII text (sample: "
            f"{snippet!r}) — the analyzer chain is scoped to [a-z0-9] "
            "corpora (TOKEN_SEP_RE treats all other characters as "
            "separators); a multilingual corpus needs a Unicode-"
            "segmentation tokenizer before the search surface is valid")


def analyze_tokens(col: Column | str) -> Column:
    """``array<string>`` of analyzed tokens (empty array for text with no
    alphanumerics — never an array holding '').

    Shape: ONE regex pass (split on the separator class) + a codegen'd
    array_remove for the empty edge tokens. The earlier
    replace-separators-then-split form ran two regex passes over every
    document and measured ~35% slower on the corpus tokenization that
    every search query and both index builds pay."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), TOKEN_SEP_RE), "")


def analyze_toks_sql(expr: str = "text") -> str:
    """The DuckDB twin of :func:`analyze_tokens` over ``expr``."""
    return (f"list_filter(string_split_regex(lower({expr}),"
            f" '{TOKEN_SEP_RE}'), x -> x <> '')")


#: The analyzed-token array over the ``documents`` table's text column —
#: the expression every search-surface oracle builds on.
ANALYZE_TOKS_SQL = analyze_toks_sql("text")


# ---------------------------------------------------------------------------
# The ``english`` analyzer: standard chain + stopword removal + S-stemming.
# ES's english analyzer adds a stop filter and a stemmer on top of the
# standard tokenizer; the stemmer here is Harman's S-stemmer (the rule set
# of Lucene's minimal_english): crude by design, exactly expressible as
# portable string CASEs in both engines.

#: Lucene's ENGLISH_STOP_WORDS_SET (the ES `_english_` stopword list).
EN_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)


def _s_stem(t: Column) -> Column:
    """Harman S-stemmer: ies→y (not eies/aies); es→e (not aes/ees/oes);
    s→'' (not us/ss)."""
    n = F.length(t)
    return (
        F.when(t.endswith("ies") & ~t.endswith("eies") & ~t.endswith("aies"),
               F.concat(t.substr(F.lit(1), n - 3), F.lit("y")))
        .when(t.endswith("es") & ~t.endswith("aes") & ~t.endswith("ees")
              & ~t.endswith("oes"),
              t.substr(F.lit(1), n - 1))
        .when(t.endswith("s") & ~t.endswith("us") & ~t.endswith("ss"),
              t.substr(F.lit(1), n - 1))
        .otherwise(t)
    )


def analyze_tokens_en(col: Column | str) -> Column:
    """``array<string>`` of english-analyzed tokens: the standard chain,
    then stopword removal (duplicates and order preserved — tf matters),
    then per-token S-stemming. Pure higher-order-function expressions —
    whole-stage codegen, no UDF."""
    toks = analyze_tokens(col)
    kept = F.filter(toks, lambda t: ~t.isin(*EN_STOPWORDS))
    return F.transform(kept, _s_stem)


_EN_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

_S_STEM_SQL = """CASE
  WHEN ends_with(t, 'ies') AND NOT ends_with(t, 'eies')
       AND NOT ends_with(t, 'aies')
    THEN substr(t, 1, length(t) - 3) || 'y'
  WHEN ends_with(t, 'es') AND NOT ends_with(t, 'aes')
       AND NOT ends_with(t, 'ees') AND NOT ends_with(t, 'oes')
    THEN substr(t, 1, length(t) - 1)
  WHEN ends_with(t, 's') AND NOT ends_with(t, 'us')
       AND NOT ends_with(t, 'ss')
    THEN substr(t, 1, length(t) - 1)
  ELSE t END"""


def analyze_toks_en_sql(expr: str = "text") -> str:
    """The DuckDB twin of :func:`analyze_tokens_en` over ``expr``."""
    return (f"list_transform(list_filter({analyze_toks_sql(expr)}, "
            f"t -> t NOT IN ({_EN_STOP_SQL})), t -> {_S_STEM_SQL})")
