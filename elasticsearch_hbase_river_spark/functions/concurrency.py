"""Driver-side job overlap for independent Spark actions.

Spark's scheduler runs several jobs at once inside one application;
actions are only sequential because driver code calls them sequentially
(optimization guide §2.6). The index builds are chains of independent
parquet writes — overlapping them lets the next write's tasks back-fill
executors freed by the current write's stragglers, and overlaps the
Python-side plan construction (py4j round-trips, GIL work) of one write
with the JVM execution of another.

Scope: BUILD orchestration only. Query paths stay single-action — the
bench times each query as one sequential action and must keep doing so.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

#: Concurrent driver jobs per build. 2-3 is plenty (guide §2.6): enough
#: to fill a straggler tail, not so many that tiny builds fight for
#: executor slots. Not a data-scale knob — it bounds DRIVER threads.
MAX_BUILD_JOBS = 3


def run_jobs(*thunks: Callable[[], Any]) -> list[Any]:
    """Run independent job thunks concurrently; return their results in
    argument order. Propagates the first failure (after every thunk has
    finished, so a failed build never publishes from a half-run pool).
    Job descriptions/groups are thread-local in Spark, so concurrently
    submitted jobs keep their own labels."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(len(thunks),
                                            MAX_BUILD_JOBS)) as pool:
        futures = [pool.submit(t) for t in thunks]
        # collect everything first: .result() re-raises, and we want all
        # sibling writes finished (not cancelled mid-write) before raising
        done = [(f, None) for f in futures]
        results: list[Any] = []
        first_err: BaseException | None = None
        for f, _ in done:
            try:
                results.append(f.result())
            except BaseException as e:  # noqa: BLE001 - re-raised below
                results.append(None)
                if first_err is None:
                    first_err = e
        if first_err is not None:
            raise first_err
        return results
