"""Skew-join mitigation: explicit key salting.

When both join sides are too large to broadcast and the key distribution is
skewed, a shuffle join sends every row of a hot key to one reducer — the
straggler that dominates wall-clock at 100 TB.  AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in `plans/session.py`) handles
this at runtime for sort-merge joins; explicit salting is the plan-level
tool for the cases AQE can't rewrite (e.g. when the skewed side feeds an
aggregation on the same key, or for shuffle-hash joins).

Mechanics: the probe side gets a uniform salt in [0, n); the build side is
replicated n times (one copy per salt value); the join key becomes
(key, salt).  Hot keys spread over n reducers; results are identical to the
unsalted join because every (key, salt) pair still meets its replica.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``probe`` (large, skewed) to ``build`` (replicated ×n_salts).

    The salt value only affects row routing, never the result set, so a
    seeded uniform random salt is safe.  ``build`` rows are replicated
    n_salts× — keep the build side the smaller one.
    """
    salted_probe = probe.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salts).cast("int")
    )
    salted_build = build.withColumn(
        SALT_COL,
        F.explode(F.array([F.lit(i) for i in range(n_salts)])),
    )
    return salted_probe.join(
        salted_build, on=on + [SALT_COL], how=how
    ).drop(SALT_COL)
