"""Sources: parquet table loaders and the canonical ``cells`` ingest relation."""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path


def ship_package_to_workers(spark) -> None:
    """Make this package importable on Python workers regardless of the
    driver's cwd/sys.path.

    The Python Data Source classes are cloudpickled BY REFERENCE (they are
    module-level classes), so worker processes must be able to import
    ``elasticsearch_hbase_river_spark``. When the engine is loaded by an
    external driver via importlib from a file path (the ``__spark_entry__``
    contract), workers inherit neither the repo cwd nor its sys.path —
    so zip the package and ``addPyFile`` it (distributed via SparkFiles to
    every current and future worker, local or cluster). Idempotent per
    session; ~100 KB of source, shipped once.
    """
    marker = "elasticsearch_hbase_river_spark._pkg_shipped"
    if spark.conf.get(f"spark.{marker}", None) == "1":
        return
    pkg_root = Path(__file__).resolve().parents[1]
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"ehrs_pkg_{os.getpid()}_{abs(hash(str(pkg_root))) % 10**8}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for p in sorted(pkg_root.rglob("*.py")):
                z.write(p, arcname=str(Path(pkg_root.name) / p.relative_to(pkg_root)))
    spark.sparkContext.addPyFile(zpath)
    spark.conf.set(f"spark.{marker}", "1")
