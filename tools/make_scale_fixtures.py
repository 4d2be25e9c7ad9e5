#!/usr/bin/env python
"""Scale-stress fixture generator: replicate a testdata sf directory K times
with consistent key offsets, TPC-H style (dimensions nation/region stay
fixed; facts and their foreign keys shift together so every join
relationship survives).

Usage: python tools/make_scale_fixtures.py [SRC] [OUT] [K]
       defaults: /root/testdata/sf0.1 /tmp/sf1 10

Documents get a per-replica suffix token (replicas become NEAR-duplicates,
not exact copies — a deliberately dup-rich corpus that stress-tests the
LSH bucket occupancy paths) and n_chars is recomputed. Embeddings
replicate identically (ties broken deterministically by id in every
ranking query). The oracle harness runs Spark and DuckDB over the SAME
files, so scaled semantics stay self-consistent by construction.
"""

from __future__ import annotations

import os
import sys

import duckdb

#: (key column, per-replica stride) per scaled table; strides comfortably
#: exceed each table's key range at any sf this tool is pointed at.
OFFSETS: dict[str, list[tuple[str, int]]] = {
    "customer": [("c_custkey", 1_000_000)],
    "supplier": [("s_suppkey", 100_000)],
    "part": [("p_partkey", 1_000_000)],
    "orders": [("o_orderkey", 100_000_000), ("o_custkey", 1_000_000)],
    "lineitem": [("l_orderkey", 100_000_000), ("l_partkey", 1_000_000),
                 ("l_suppkey", 100_000)],
    "events": [("event_id", 10_000_000), ("user_id", 1_000_000)],
    "documents": [("doc_id", 100_000)],
    "embeddings": [("vec_id", 100_000)],
}

FIXED = ("nation", "region")


def scale(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
            TO '{out}/{t}.parquet' (FORMAT parquet)""")
        print(f"{t}: copied")
    for t, offs in OFFSETS.items():
        strides = dict(offs)
        all_cols = _cols(con, f"{src}/{t}.parquet")
        sel_parts = []
        for i in range(k):
            exprs = []
            for c in all_cols:
                if c in strides:
                    exprs.append(f"{c} + {i * strides[c]} AS {c}")
                elif t == "documents" and i > 0 and c == "text":
                    exprs.append(f"text || ' rep{i}' AS text")
                elif t == "documents" and i > 0 and c == "n_chars":
                    exprs.append(f"length(text || ' rep{i}') AS n_chars")
                else:
                    exprs.append(c)
            sel_parts.append(f"SELECT {', '.join(exprs)} "
                             f"FROM read_parquet('{src}/{t}.parquet')")
        union = " UNION ALL ".join(sel_parts)
        con.execute(f"""
            COPY ({union}) TO '{out}/{t}.parquet'
            (FORMAT parquet, ROW_GROUP_SIZE 262144)""")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


def _cols(con, path: str) -> list[str]:
    return [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()]


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, out, k)
