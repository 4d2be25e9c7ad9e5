"""Drive the product surface exactly like the external driver does.

Loads ``__spark_entry__.py`` into a DEFAULT-config SparkSession (no preset
confs — the package must self-configure at runtime), runs ``entry(spark)``,
then every ``queries()`` entry that has an ``oracle_sql()`` twin against
DuckDB on the same parquet directory, using the dtype-strict compare from
``tests/oracle_harness.py``. Queries without an oracle get a rows-only run.

Usage:  python tools/verify_oracle.py [sf_dir] [name ...]
Prints one line per query (PASS/FAIL/ERR) and a final tally; exit 0 iff all
checked queries pass.
"""

from __future__ import annotations

import importlib.util
import sys
import time
import traceback

REPO = "/root/repo"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = mod.entry(spark).count()
    print(f"ENTRY rows: {n}")
    assert n > 0, "entry(spark) returned no rows"

    sys.path.insert(0, REPO)
    from tests.oracle_harness import compare

    queries, oracles = mod.queries(), mod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 1
    results: dict[str, str] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name in oracles:
                compare(fn(spark, sf_dir), oracles[name], sf_dir)
                results[name] = "PASS"
            else:
                rows = fn(spark, sf_dir).count()
                results[name] = f"ROWS_ONLY({rows})"
        except AssertionError as e:
            results[name] = "FAIL"
            print(f"--- {name} FAIL: {e}")
        except Exception:
            results[name] = "ERR"
            print(f"--- {name} ERR:\n{traceback.format_exc(limit=4)}")
        print(f"{name}: {results[name]} ({time.time() - t0:.1f}s)", flush=True)
        # Same cache hygiene as bench.py: persisted/checkpointed blocks
        # from one query otherwise linger for the rest of the sweep,
        # shrinking execution memory for every later query (leaked blocks
        # caused spurious memory failures in large-sf sweeps).
        import gc

        spark.catalog.clearCache()
        gc.collect()
        # Direct ByteBuffers from parquet vectored IO are released by their
        # Cleaner only at JVM GC; with a mostly-idle heap GC never fires and
        # allocation hits -XX:MaxDirectMemorySize mid-sweep (observed at
        # sf10: 52 MB row-group fetches failing at a 1 GB cap with ~1 GB
        # already allocated by earlier queries).
        spark.sparkContext._jvm.System.gc()

    bad = [k for k, v in results.items() if v in ("FAIL", "ERR")]
    npass = sum(1 for v in results.values() if v == "PASS")
    nrows = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    print(f"TALLY: {npass} pass, {nrows} rows-only, {len(bad)} bad "
          f"of {len(results)} at {sf_dir}")
    if bad:
        print("BAD:", ", ".join(bad))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
