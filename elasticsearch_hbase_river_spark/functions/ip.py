"""IP address parsing/canonicalization shared by ES|QL ``TO_IP`` and its
DuckDB oracle twins.

ES ``TO_IP`` accepts IPv4 dotted quads and IPv6 strings and renders the
RFC 5952 canonical form (lowercase, leading zeros stripped, the leftmost
longest run of >= 2 zero groups compressed to ``::``); unconvertible
values fold to null, the ES|QL null-with-warning convention.

Subset contract (documented in COVERAGE.md): pure-hex IPv6 only —
IPv4-mapped forms (``::ffff:1.2.3.4``) and zone indices fold to null.

Both engines run the IDENTICAL algorithm: the 28-case leftmost-longest
zero-run search over the 8 hextets is GENERATED once (``_RUNS``) and
emitted as a Spark ``when``-chain and as a SQL ``CASE`` from the same
list, so there is no hand-translation to drift.

Everything is JVM-side column expressions (split / filter / transform /
regexp) — no UDF; TO_IP stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: strict dotted-quad octet (leading zeros rejected, the ES TO_IP default)
IPV4_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
IPV4_RE = f"^{IPV4_OCTET}(\\.{IPV4_OCTET}){{3}}$"

_HEXTET_RE = "^[0-9a-f]{1,4}$"

#: (start, length) of every compressible zero run over 8 hextets, in RFC
#: 5952 priority order: longest first, leftmost on ties. 1-based starts.
_RUNS: list[tuple[int, int]] = [
    (s, l)
    for l in range(8, 1, -1)
    for s in range(1, 8 - l + 2)
]


def _strip0(x: Column) -> Column:
    # left-pad to 4 then strip exactly up to 3 leading zeros: '0' and
    # '0000' both land on '0', '00ab' on 'ab' (a bare ^0+ strip would
    # turn a lone '0' into the empty string)
    return F.regexp_replace(F.lpad(x, 4, "0"), "^0{1,3}", "")


def _let(value: Column, body) -> Column:
    """Let-binding for column expressions: bind ``value`` ONCE as a
    higher-order-function lambda variable and reference it cheaply in
    ``body``. Without this every reference to a subexpression INLINES
    its whole tree — the naive 28-case run search duplicated the parse
    tree ~200x and took Catalyst >60 s to analyze; with bindings the
    tree is linear and analysis is milliseconds. Runtime cost: a
    1-element array ``transform``, still whole-stage codegen."""
    return F.element_at(F.transform(F.array(value), body), 1)


def to_ip_col(c: Column) -> Column:
    """Canonical IP string (or null) from an arbitrary string column."""

    def with_lc(lc: Column) -> Column:
        return _let(F.split(lc, "::", -1),
                    lambda parts: with_parts(lc, parts))

    def groups(part: Column) -> Column:
        return F.when(part == "", F.array().cast("array<string>")) \
                .otherwise(F.split(part, ":", -1))

    def with_parts(lc: Column, parts: Column) -> Column:
        ndc = F.size(parts)
        left = groups(F.element_at(parts, 1))
        right = F.when(ndc == 2, groups(F.element_at(parts, 2))) \
                 .otherwise(F.array().cast("array<string>"))
        return _let(F.struct(left.alias("lg"), right.alias("rg")),
                    lambda g: with_groups(lc, ndc, g["lg"], g["rg"]))

    def with_groups(lc, ndc, left, right) -> Column:
        n = F.size(left) + F.size(right)
        toks_ok = F.forall(F.concat(left, right),
                           lambda x: x.rlike(_HEXTET_RE))
        struct_ok = ((ndc == 1) & (n == 8)) | ((ndc == 2) & (n <= 7))
        ok6 = lc.contains(":") & (ndc <= 2) & struct_ok & toks_ok
        hexs = F.transform(
            F.concat(left,
                     F.array_repeat(F.lit("0"), (F.lit(8) - n).cast("int")),
                     right),
            _strip0)
        canon6 = _let(hexs, with_hexs)
        return F.when(lc.rlike(IPV4_RE), lc).when(ok6, canon6)

    def with_hexs(h: Column) -> Column:
        # leftmost-longest zero-run search over a 8-char '1'/'0' bitmap:
        # locate('1' * l, bitmap) is the leftmost start of a run >= l, so
        # scanning l from 8 down to 2 yields the RFC 5952 choice
        bitmap = F.array_join(
            F.transform(h, lambda x: F.when(x == "0", F.lit("1"))
                        .otherwise(F.lit("0"))), "")
        return _let(bitmap, lambda b: _let(_best_run(b),
                                           lambda bs: _render(h, bs)))

    def _best_run(b: Column) -> Column:
        chain = None
        for l in range(8, 1, -1):
            pos = F.locate("1" * l, b)
            hit = F.struct(pos.alias("s"), F.lit(l).alias("l"))
            chain = (F.when(pos > 0, hit) if chain is None
                     else chain.when(pos > 0, hit))
        return chain.otherwise(
            F.struct(F.lit(0).alias("s"), F.lit(0).alias("l")))

    def _render(h: Column, bs: Column) -> Column:
        s_, l_ = bs["s"], bs["l"]
        compressed = F.concat(
            F.array_join(F.slice(h, 1, s_ - 1), ":"),
            F.lit("::"),
            F.array_join(
                F.slice(F.concat(h, F.array(F.lit(""))),  # start > size guard
                        s_ + l_, F.lit(9) - s_ - l_), ":"))
        return F.when(l_ >= 2, compressed).otherwise(F.array_join(h, ":"))

    return _let(F.lower(F.trim(c)), with_lc)


def to_ip_sql(expr: str) -> str:
    """DuckDB SQL computing the identical canonicalization of ``expr``.

    Emitted as a self-contained scalar subquery so it can sit in any
    SELECT list; the run search is the same generated 28-case priority
    list as the Spark side."""
    conds = []
    for s, l in _RUNS:
        zs = " AND ".join(f"h[{k}] = '0'" for k in range(s, s + l))
        conds.append(f"WHEN {zs} THEN {{'s': {s}, 'l': {l}}}")
    case = "CASE " + " ".join(conds) + " ELSE {'s': 0, 'l': 0} END"
    return f"""(
WITH _i AS (SELECT lower(trim({expr})) AS lc),
_p AS (SELECT lc, str_split(lc, '::') AS parts FROM _i),
_g AS (SELECT lc, len(parts) AS ndc,
         CASE WHEN parts[1] = '' THEN []
              ELSE str_split(parts[1], ':') END AS lg,
         CASE WHEN len(parts) = 2 AND parts[2] <> ''
              THEN str_split(parts[2], ':') ELSE [] END AS rg
       FROM _p),
_v AS (SELECT lc, ndc, lg, rg, len(lg) + len(rg) AS n FROM _g),
_h AS (SELECT lc,
         list_transform(
           lg || list_transform(range(8 - n), x -> '0') || rg,
           x -> regexp_replace(lpad(x, 4, '0'), '^0{{1,3}}', '')) AS h,
         (contains(lc, ':') AND ndc <= 2
          AND ((ndc = 1 AND n = 8) OR (ndc = 2 AND n <= 7))
          AND len(list_filter(lg || rg,
                x -> NOT regexp_matches(x, '^[0-9a-f]{{1,4}}$'))) = 0)
           AS ok6
       FROM _v),
_r AS (SELECT lc, ok6, h, {case} AS b FROM _h),
_o AS (SELECT lc, ok6,
         CASE WHEN b.l >= 2 THEN
           -- DuckDB array_to_string([]) is NULL, not '' — coalesce both
           -- flanks so '::1' / '1::' / '::' render
           coalesce(array_to_string(h[1:b.s - 1], ':'), '') || '::' ||
           coalesce(array_to_string(h[b.s + b.l:8], ':'), '')
         ELSE array_to_string(h, ':') END AS canon6
       FROM _r)
SELECT CASE
  WHEN regexp_matches(lc, '{IPV4_RE}') THEN lc
  WHEN ok6 THEN canon6
END FROM _o)"""
