"""Field-name normalization.

Reference semantics (HBaseRiver.java:314-326, pinned by
HBaseRiverTest.java:37-47): when normalization is on, lower-case the field
name and strip every character outside ``[a-z0-9\\-_]`` plus the characters
of the configured column separator (each separator char is added to the
allowed alphabet). ``null`` passes through; normalization off passes through.

Three twins of the same function:
- :func:`normalize_field_py`   — pure Python (unit tests port the reference's
  truth table against this).
- :func:`normalize_field_col`  — Spark ``Column`` expression (JVM-side,
  whole-stage-codegen friendly; no UDF).
- :func:`normalize_sql`        — ANSI-SQL string for the DuckDB oracle twin
  (DuckDB needs the ``'g'`` flag to replace all matches).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_BASE_ALPHABET = "a-z0-9_"  # '-' appended last so it needs no escaping


def _allowed_class(separator: str | None) -> str:
    """Regex character class of allowed chars, dash placed last.

    The reference appends each separator char to the allowed alphabet
    (HBaseRiver.java:319-323). We keep the class free of backslash escapes so
    the same literal string is valid in Python, Spark SQL, and DuckDB.
    """
    extra = ""
    for ch in sorted(set(separator or "")):
        if ch in "-_" or ch.isalnum():
            continue  # already in the base alphabet
        if ch in "[]^\\":
            raise ValueError(f"unsupported separator char for regex class: {ch!r}")
        extra += ch
    return f"[^{_BASE_ALPHABET}{extra}-]"


def normalize_field_py(name: str | None, separator: str | None = None,
                       normalize: bool = True) -> str | None:
    """Pure-Python twin of HBaseRiver.normalizeField (HBaseRiver.java:314-326)."""
    if not normalize or name is None:
        return name
    return re.sub(_allowed_class(separator), "", name.lower())


def normalize_field_col(col: Column, separator: str | None = None,
                        normalize: bool = True) -> Column:
    """Spark Column twin: ``lower`` + ``regexp_replace`` (built-ins only)."""
    if not normalize:
        return col
    return F.regexp_replace(F.lower(col), _allowed_class(separator), "")


def normalize_sql(expr: str, separator: str | None = None) -> str:
    """DuckDB-SQL twin. ``expr`` is a SQL expression string."""
    return f"regexp_replace(lower({expr}), '{_allowed_class(separator)}', '', 'g')"
