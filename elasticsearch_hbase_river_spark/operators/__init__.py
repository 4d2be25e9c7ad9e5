"""Operator inventory (SURVEY.md §2) — each module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]``  (DuckDB SQL twins; absent keys => rows-only)

``registry`` merges them for ``__spark_entry__``.
"""
