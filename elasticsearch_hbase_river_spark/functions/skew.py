"""Skew handling for hot join keys.

Partial aggregation already neutralizes skew for aggregates (map-side
combine), and AQE's skew-join splitting handles sort-merge joins at
runtime. The remaining case — a shuffled join where one key dominates and
the build side is too big to broadcast — is solved by salting: replicate
the small side ``buckets`` times and scatter the big side's hot rows across
the replicas, so one hot key occupies ``buckets`` tasks instead of one.

The salt is DETERMINISTIC (hash of the big side's whole row, not rand()):
results are reproducible run-to-run and under task retries — rand() in a
retried task silently reshuffles rows between buckets mid-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(big: DataFrame, small: DataFrame, on: str,
                buckets: int = 8, how: str = "inner") -> DataFrame:
    """Join ``big`` ⋈ ``small`` on column ``on`` with the hot-key shuffle
    spread over ``buckets`` salt partitions per key.

    ``small`` is exploded ``buckets``× (its rows replicate per salt value);
    ``big`` rows pick one salt bucket by hashing all their columns. The
    join key becomes (on, salt) — same results as the plain join, but a
    key holding N rows lands in ~N/buckets-row tasks."""
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in big.columns]),
                         F.lit(buckets)))
    out = salted_big.join(salted_small, [on, SALT_COL], how)
    return out.drop(SALT_COL)
