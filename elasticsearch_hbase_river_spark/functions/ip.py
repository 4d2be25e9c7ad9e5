"""IP address parsing/canonicalization shared by ES|QL ``TO_IP`` and its
DuckDB oracle twins.

ES ``TO_IP`` accepts IPv4 dotted quads and IPv6 strings and renders the
RFC 5952 canonical form (lowercase, leading zeros stripped, the leftmost
longest run of >= 2 zero groups compressed to ``::``); unconvertible
values fold to null, the ES|QL null-with-warning convention.

Dotted-quad tails (RFC 4291 §2.2.3: ``::ffff:1.2.3.4``, ``::1.2.3.4``)
parse as the last two hextets, and the IPv4-MAPPED prefix
(``::ffff:0:0/96``) renders back as the dotted quad — exactly Java's
``InetAddress`` / ES behavior, where a mapped address IS an IPv4
address. Subset contract (COVERAGE.md): zone indices (``%eth0``) fold
to null.

``ip_hex32_col`` / ``ip_hex32_sql`` expose the 128-bit VALUE as 32
lowercase nibbles with IPv4 mapped into ``::ffff:0:0/96`` — the
Lucene ``InetAddressPoint`` encoding — so CIDR matching is one
fixed-length string prefix compare for v4 and v6 alike.

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


#: dotted-quad tail of an IPv6 string (strict octets, after a colon)
_V4_TAIL_RE = f":({IPV4_OCTET}(\\.{IPV4_OCTET}){{3}})$"


def _v4_tail_to_hex(lc: Column) -> Column:
    """Rewrite a trailing dotted quad into its two hextets (RFC 4291
    §2.2.3): ``::ffff:1.2.3.4`` → ``::ffff:102:304``. Strings without a
    valid strict-octet quad tail pass through untouched (an INVALID quad
    stays in place and fails the hextet check downstream → null)."""
    quad = F.regexp_extract(lc, _V4_TAIL_RE, 1)
    o = F.transform(F.split(quad, r"\."), lambda x: x.cast("long"))
    hx = lambda v: F.lower(F.conv(v.cast("string"), 10, 16))  # noqa: E731
    rewritten = F.concat(
        F.regexp_replace(lc, _V4_TAIL_RE, ""), F.lit(":"),
        hx(F.element_at(o, 1) * 256 + F.element_at(o, 2)), F.lit(":"),
        hx(F.element_at(o, 3) * 256 + F.element_at(o, 4)))
    return F.when(lc.contains(":") & (quad != ""), rewritten).otherwise(lc)


def to_ip_col(c: Column) -> Column:
    """Canonical IP string (or null) from an arbitrary string column."""

    def with_lc(lc0: Column) -> Column:
        return _let(_v4_tail_to_hex(lc0), with_lc2)

    def with_lc2(lc: Column) -> Column:
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
        # IPv4-MAPPED value (::ffff:0:0/96): render as the dotted quad —
        # Java's InetAddress / ES treat the mapped range AS IPv4
        v7 = F.conv(F.element_at(h, 7), 16, 10).cast("long")
        v8 = F.conv(F.element_at(h, 8), 16, 10).cast("long")
        dotted = F.concat_ws(
            ".", F.floor(v7 / 256).cast("long"), F.pmod(v7, 256),
            F.floor(v8 / 256).cast("long"), F.pmod(v8, 256))
        mapped = F.array_join(F.slice(h, 1, 6), ":") == "0:0:0:0:0:ffff"
        # leftmost-longest zero-run search over a 8-char '1'/'0' bitmap:
        # locate('1' * l, bitmap) is the leftmost start of a run >= l, so
        # scanning l from 8 down to 2 yields the RFC 5952 choice
        bitmap = F.array_join(
            F.transform(h, lambda x: F.when(x == "0", F.lit("1"))
                        .otherwise(F.lit("0"))), "")
        canon = _let(bitmap, lambda b: _let(_best_run(b),
                                            lambda bs: _render(h, bs)))
        return F.when(mapped, dotted).otherwise(canon)

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
WITH _i0 AS (SELECT lower(trim({expr})) AS lc0),
_iq AS (SELECT lc0, regexp_extract(lc0, '{_V4_TAIL_RE}', 1) AS quad
        FROM _i0),
_io AS (SELECT lc0, quad,
          CASE WHEN quad <> ''
               THEN list_transform(str_split(quad, '.'), x -> x::BIGINT)
          END AS o
        FROM _iq),
_i AS (SELECT CASE WHEN contains(lc0, ':') AND quad <> ''
         THEN regexp_replace(lc0, '{_V4_TAIL_RE}', '') || ':' ||
              -- DuckDB to_hex is UPPERCASE (Spark conv too — both sides
              -- lower() explicitly)
              lower(to_hex(o[1] * 256 + o[2])) || ':' ||
              lower(to_hex(o[3] * 256 + o[4]))
         ELSE lc0 END AS lc FROM _io),
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
         CASE WHEN h[1:6] = ['0', '0', '0', '0', '0', 'ffff'] THEN
           -- IPv4-mapped value renders as the dotted quad (Java/ES)
           (('0x' || h[7])::BIGINT // 256)::VARCHAR || '.' ||
           (('0x' || h[7])::BIGINT % 256)::VARCHAR || '.' ||
           (('0x' || h[8])::BIGINT // 256)::VARCHAR || '.' ||
           (('0x' || h[8])::BIGINT % 256)::VARCHAR
         WHEN b.l >= 2 THEN
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


def ip_hex32_col(c: Column) -> Column:
    """The 128-bit value of an IP string as 32 lowercase nibbles (or
    null): IPv6 hextets lpad'ed to 4, IPv4 mapped into ``::ffff:0:0/96``
    — the Lucene ``InetAddressPoint`` encoding ES's ip field/CIDR
    queries run on. Fixed-length hex compares lexicographically ==
    numerically, so a CIDR test is one string-prefix compare."""

    def with_lc(lc0: Column) -> Column:
        return _let(_v4_tail_to_hex(lc0), with_lc2)

    def with_lc2(lc: Column) -> Column:
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
        hex32 = F.array_join(F.transform(
            F.concat(left,
                     F.array_repeat(F.lit("0"), (F.lit(8) - n).cast("int")),
                     right),
            lambda x: F.lpad(x, 4, "0")), "")
        # IPv4 → mapped: 20 zero nibbles + ffff + 8 v4 nibbles
        o = F.transform(F.split(lc, r"\."), lambda x: x.cast("long"))
        v4hex = F.concat(
            F.lit("00000000000000000000ffff"),
            F.lpad(F.lower(F.conv(
                (F.element_at(o, 1) * 16777216 + F.element_at(o, 2) * 65536
                 + F.element_at(o, 3) * 256 + F.element_at(o, 4))
                .cast("string"), 10, 16)), 8, "0"))
        return F.when(lc.rlike(IPV4_RE), v4hex).when(ok6, hex32)

    return _let(F.lower(F.trim(c)), with_lc)


def ip_hex32_sql(expr: str) -> str:
    """DuckDB scalar subquery computing the identical 32-nibble
    encoding of ``expr`` (v4 mapped), for CIDR oracle twins."""
    return f"""(
WITH _i0 AS (SELECT lower(trim({expr})) AS lc0),
_iq AS (SELECT lc0, regexp_extract(lc0, '{_V4_TAIL_RE}', 1) AS quad
        FROM _i0),
_io AS (SELECT lc0, quad,
          CASE WHEN quad <> ''
               THEN list_transform(str_split(quad, '.'), x -> x::BIGINT)
          END AS o
        FROM _iq),
_i AS (SELECT CASE WHEN contains(lc0, ':') AND quad <> ''
         THEN regexp_replace(lc0, '{_V4_TAIL_RE}', '') || ':' ||
              lower(to_hex(o[1] * 256 + o[2])) || ':' ||
              lower(to_hex(o[3] * 256 + o[4]))
         ELSE lc0 END AS lc FROM _io),
_p AS (SELECT lc, str_split(lc, '::') AS parts FROM _i),
_g AS (SELECT lc, len(parts) AS ndc,
         CASE WHEN parts[1] = '' THEN []
              ELSE str_split(parts[1], ':') END AS lg,
         CASE WHEN len(parts) = 2 AND parts[2] <> ''
              THEN str_split(parts[2], ':') ELSE [] END AS rg
       FROM _p),
_v AS (SELECT lc, ndc, lg, rg, len(lg) + len(rg) AS n FROM _g),
_h AS (SELECT lc,
         array_to_string(list_transform(
           lg || list_transform(range(8 - n), x -> '0') || rg,
           x -> lpad(x, 4, '0')), '') AS hex32,
         (contains(lc, ':') AND ndc <= 2
          AND ((ndc = 1 AND n = 8) OR (ndc = 2 AND n <= 7))
          AND len(list_filter(lg || rg,
                x -> NOT regexp_matches(x, '^[0-9a-f]{{1,4}}$'))) = 0)
           AS ok6
       FROM _v)
SELECT CASE
  WHEN regexp_matches(lc, '{IPV4_RE}') THEN
    '00000000000000000000ffff' ||
    lpad(lower(to_hex(
      list_transform(str_split(lc, '.'), x -> x::BIGINT)[1] * 16777216
      + list_transform(str_split(lc, '.'), x -> x::BIGINT)[2] * 65536
      + list_transform(str_split(lc, '.'), x -> x::BIGINT)[3] * 256
      + list_transform(str_split(lc, '.'), x -> x::BIGINT)[4])), 8, '0')
  WHEN ok6 THEN hex32
END FROM _h)"""


def cidr_block_hex(cidr: str) -> tuple[str, int]:
    """(network hex32, mapped prefix bits) of a CIDR literal — IPv4
    blocks map into ``::ffff:0:0/96`` (prefix + 96), matching the
    column encoding. Raises ValueError on malformed blocks."""
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    if isinstance(net, ipaddress.IPv4Network):
        v4 = int(net.network_address)
        return ("00000000000000000000ffff" + format(v4, "08x"),
                net.prefixlen + 96)
    return (format(int(net.network_address), "032x"), net.prefixlen)


def cidr_match_hex_conds(cidr: str) -> tuple[str, int, list[str]]:
    """Compile a CIDR block into (full-nibble prefix, nibble count,
    allowed chars for the partial nibble — empty list when the prefix
    ends on a nibble boundary). Shared by the Spark compiler and the
    SQL twin generator so both engines run the identical test."""
    net_hex, bits = cidr_block_hex(cidr)
    nib, rem = divmod(bits, 4)
    if rem == 0:
        return net_hex[:nib], nib, []
    want = int(net_hex[nib], 16) >> (4 - rem)
    allowed = [d for d in "0123456789abcdef"
               if int(d, 16) >> (4 - rem) == want]
    return net_hex[:nib], nib, allowed


def cidr_match_sql_cond(hcol: str, cidr: str) -> str:
    """DuckDB boolean expression testing the hex32 column ``hcol``
    against one CIDR block — generated from the SAME compiled prefix as
    the Spark side (:func:`cidr_match_hex_conds`), no hand-translation."""
    pref, nib, allowed = cidr_match_hex_conds(cidr)
    parts = []
    if nib:
        parts.append(f"substr({hcol}, 1, {nib}) = '{pref}'")
    if allowed:
        opts = ", ".join(f"'{a}'" for a in allowed)
        parts.append(f"substr({hcol}, {nib + 1}, 1) IN ({opts})")
    if not parts:
        parts = ["TRUE"]
    return "(" + " AND ".join(parts) + ")"


def mask_hex32_col(h: Column, bits: int) -> Column:
    """hex32 with everything past the first ``bits`` bits zeroed:
    compile-time nibble split, the partial nibble masked via a 16-char
    ``translate`` map — all whole-stage-codegen string ops."""
    nib, rem = divmod(bits, 4)
    parts: list[Column] = []
    if nib:
        parts.append(F.substring(h, 1, nib))
    used = nib
    if rem:
        mapped = "".join(
            format((int(d, 16) >> (4 - rem)) << (4 - rem), "x")
            for d in "0123456789abcdef")
        parts.append(F.translate(F.substring(h, nib + 1, 1),
                                 "0123456789abcdef", mapped))
        used += 1
    if used < 32:
        parts.append(F.lit("0" * (32 - used)))
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def mask_hex32_sql(hexpr: str, bits: int) -> str:
    """DuckDB expression: the identical mask over a hex32 expression."""
    nib, rem = divmod(bits, 4)
    parts: list[str] = []
    if nib:
        parts.append(f"substr({hexpr}, 1, {nib})")
    used = nib
    if rem:
        mapped = "".join(
            format((int(d, 16) >> (4 - rem)) << (4 - rem), "x")
            for d in "0123456789abcdef")
        parts.append(f"translate(substr({hexpr}, {nib + 1}, 1), "
                     f"'0123456789abcdef', '{mapped}')")
        used += 1
    if used < 32:
        parts.append(f"'{'0' * (32 - used)}'")
    return parts[0] if len(parts) == 1 else "(" + " || ".join(parts) + ")"


#: the 24-nibble prefix every IPv4-mapped hex32 value carries
MAPPED_PREFIX = "00000000000000000000ffff"


def hex32_to_hextets_col(h: Column) -> Column:
    """hex32 → colon-joined 8×4 hextet text (feedable to to_ip_col for
    canonical rendering, which also maps ::ffff:0:0/96 back to dots)."""
    return F.concat_ws(":", *[F.substring(h, 1 + 4 * i, 4)
                              for i in range(8)])


def hex32_to_hextets_sql(hexpr: str) -> str:
    return " || ':' || ".join(f"substr({hexpr}, {1 + 4 * i}, 4)"
                              for i in range(8))


def ip_prefix_sql(expr: str, v4len: int, v6len: int) -> str:
    """DuckDB scalar subquery: the identical IP_PREFIX(ip, v4len,
    v6len) — hex32, family-picked mask, canonical re-render."""
    m4 = mask_hex32_sql("h", 96 + v4len)
    m6 = mask_hex32_sql("h", v6len)
    return f"""(
WITH _hh AS (SELECT {ip_hex32_sql(expr)} AS h),
_mm AS (SELECT CASE WHEN substr(h, 1, 24) = '{MAPPED_PREFIX}'
                    THEN {m4} ELSE {m6} END AS m
        FROM _hh WHERE h IS NOT NULL)
SELECT {to_ip_sql(hex32_to_hextets_sql('m'))} FROM _mm)"""
