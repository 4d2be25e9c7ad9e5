"""Cross-engine deterministic numeric helpers.

``round(x, 6)`` is NOT portable: for a double just below a half-boundary
(e.g. 0.6166874999999999) DuckDB's round goes up while Spark/Python go down.
``floor(x * 1e6 + 0.5) / 1e6`` is pure IEEE-double arithmetic — identical in
every engine — so all float outputs that the oracle hashes go through these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def roundn_col(col: Column, n: int = 6) -> Column:
    scale = 10 ** n
    return (F.floor(col * F.lit(float(scale)) + F.lit(0.5)) / F.lit(float(scale)))


def roundn_sql(expr: str, n: int = 6) -> str:
    scale = float(10 ** n)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
