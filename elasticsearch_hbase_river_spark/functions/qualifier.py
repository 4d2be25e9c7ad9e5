"""Qualifier splitting and nested-document assembly.

Reference semantics (pinned by HBaseParserTest.java:31-283):

- ``readQualifierStructure`` (HBaseParser.java:226-244): with a configured
  ``columnSeparator``, a qualifier like ``data::set1::category1`` becomes the
  nested path ``data -> set1 -> category1``. An *empty trailing* sub-qualifier
  (``data::set2::``) collapses to a scalar at the parent path (``data.set2``),
  **overwriting** any previously built subtree — last-write-wins
  (HBaseParserTest.java:120-138). A later subtree likewise replaces an earlier
  scalar (the unconditional map-install at HBaseParser.java:236-237). Each
  path component is normalized (:mod:`normalize`). Empty *middle* components
  are preserved as empty-string keys. Null/empty separator disables splitting
  (HBaseParserTest.java:79-116).
- ``readDataTree`` (HBaseParser.java:204-216): a row's cells fold into
  ``{family: {qualifier-tree}}`` with the family name normalized.
- ``findKeyInDataTree`` (HBaseParser.java:184-194): walk the nested map by a
  separator-joined path; ``None`` when an intermediate node is not a map.

The pure-Python versions below are the unit-test surface (the reference's
tests run against them verbatim). The relational form used by the Spark
operators represents each cell as ``(path: array<string>, leaf: string)`` —
dynamic nesting depth maps to a path array, not per-row struct types
(SURVEY.md §1.4), and the split itself is pure built-in column algebra
(:func:`split_qualifier_col` / :func:`split_qualifier_sql`).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from elasticsearch_hbase_river_spark.functions.normalize import (
    normalize_field_py,
    normalize_sql,
)

# ---------------------------------------------------------------------------
# Pure-Python twins (unit-test surface; ports of the reference's transforms)
# ---------------------------------------------------------------------------


def read_qualifier_structure(parent: dict[str, Any], qualifier: str, value: str,
                             separator: str | None, normalize: bool = True) -> None:
    """In-place fold of one cell into a nested dict (HBaseParser.java:226-244)."""
    norm = lambda s: normalize_field_py(s, separator, normalize)  # noqa: E731
    if separator:
        pos = qualifier.find(separator)
        if pos != -1:
            parent_q = norm(qualifier[:pos])
            child_q = qualifier[pos + len(separator):]
            if child_q:
                if not isinstance(parent.get(parent_q), dict):
                    parent[parent_q] = {}
                read_qualifier_structure(parent[parent_q], child_q, value,
                                         separator, normalize)
                return
            # empty trailing sub-qualifier: scalar at parent, separator
            # stripped from the key — overwrites any subtree (LWW)
            parent[norm(qualifier.replace(separator, ""))] = value
            return
    parent[norm(qualifier)] = value


def read_data_tree(cells: list[tuple[str, str, str]], separator: str | None,
                   normalize: bool = True) -> dict[str, Any]:
    """Fold ``(family, qualifier, value)`` cells into a nested document
    (HBaseParser.java:204-216). Cell order matters (last write wins)."""
    tree: dict[str, Any] = {}
    for family, qualifier, value in cells:
        fam = normalize_field_py(family, separator, normalize)
        tree.setdefault(fam, {})
        read_qualifier_structure(tree[fam], qualifier, value, separator, normalize)
    return tree


def find_key_in_data_tree(tree: dict[str, Any], key_path: str,
                          separator: str) -> str | None:
    """Walk the nested map by separator path (HBaseParser.java:184-194)."""
    if separator not in key_path:
        v = tree.get(key_path)
        return v if isinstance(v, str) or v is None else None
    head, _, rest = key_path.partition(separator)
    node = tree.get(head)
    if isinstance(node, dict):
        return find_key_in_data_tree(node, rest, separator)
    return None


def effective_path(qualifier: str, separator: str | None,
                   normalize: bool = True) -> list[str]:
    """The flattened path a qualifier resolves to under the reference
    semantics: split on the separator; drop exactly one trailing empty
    component (the empty-sub-qualifier collapse, HBaseParser.java:238-239);
    normalize each remaining component."""
    if not separator:
        return [normalize_field_py(qualifier, separator, normalize)]
    parts = qualifier.split(separator)
    if len(parts) > 1 and parts[-1] == "":
        parts = parts[:-1]
    return [normalize_field_py(p, separator, normalize) for p in parts]


# ---------------------------------------------------------------------------
# Relational twins (Spark Column / DuckDB SQL) of ``effective_path``
# ---------------------------------------------------------------------------


def split_qualifier_col(col: Column, separator: str | None,
                        normalize: bool = True) -> Column:
    """``array<string>`` path for a qualifier column — built-ins only.

    ``split`` keeps trailing empty strings (limit=-1), matching Java's
    ``indexOf`` walk; one trailing empty is then dropped via ``slice``.
    """
    if not separator:
        parts = F.array(col)
    else:
        parts = F.split(col, _regex_quote(separator), -1)
        parts = F.when(
            (F.size(parts) > 1) & (F.element_at(parts, -1) == F.lit("")),
            F.slice(parts, 1, F.size(parts) - 1),
        ).otherwise(parts)
    if normalize:
        from elasticsearch_hbase_river_spark.functions.normalize import _allowed_class
        cls = _allowed_class(separator)
        parts = F.transform(parts, lambda p: F.regexp_replace(F.lower(p), cls, ""))
    return parts


def split_qualifier_sql(expr: str, separator: str | None,
                        normalize: bool = True) -> str:
    """DuckDB twin of :func:`split_qualifier_col` (string_split is literal)."""
    if not separator:
        inner = f"[{expr}]"
    else:
        inner = (
            f"CASE WHEN len(string_split({expr}, '{separator}')) > 1 "
            f"AND string_split({expr}, '{separator}')[-1] = '' "
            f"THEN string_split({expr}, '{separator}')[1:len(string_split({expr}, '{separator}'))-1] "
            f"ELSE string_split({expr}, '{separator}') END"
        )
    if normalize:
        return f"list_transform({inner}, p -> {normalize_sql('p', separator)})"
    return inner


def _regex_quote(separator: str) -> str:
    """Quote a literal separator for Spark's regex-based ``split``."""
    return "".join(f"\\{c}" if not c.isalnum() else c for c in separator)
