"""Skew-join mitigation: hot-key isolation and explicit key salting.

When both join sides are too large to broadcast and the key distribution is
skewed, a shuffle join sends every row of a hot key to one reducer — the
straggler that dominates wall-clock at 100 TB.  Three tools, in the order
the ``skew_probe`` measurements (SCALE_PROBE.json) rank them:

1. **AQE skew-join splitting** (`spark.sql.adaptive.skewJoin.enabled`, on
   in `plans/session.py`) — the default and the measured winner at 10x
   probe scale (1.62x over the static join at 40%-hot; 2.37x at 100x,
   where hot-key isolation's 2.7x overtakes it — see SCALE_PROBE.json):
   the oversized shuffle partition is split at runtime and the matching
   build partition duplicated per split.  Requires a sort-merge/
   shuffle-hash join under AQE; nothing to do at the plan level.
2. **Hot-key isolation** (:func:`isolated_skew_join`) — the plan-level
   tool when AQE can't rewrite (the skewed side feeds a same-key
   aggregation, or AQE is off), and the measured winner at 100x probe
   scale (2.7x vs AQE's 2.37x): hot keys are detected with one bounded
   count pass, their probe rows broadcast-joined (no shuffle for the
   skewed slice), the long tail shuffle-joined normally.  1.24x over the
   static join at 10x probe scale.
3. **Blanket salting** (:func:`salted_join`) — the classic textbook fix,
   kept and measured HONESTLY: replicating the ENTIRE build side n_salts x
   costs more than the straggler it removes at realistic build sizes
   (measured 2x SLOWER than the static join at probe scale with
   n_salts=16, the replication scaling linearly in n_salts).  Reach for it
   only when the build side is tiny relative to the skew yet above the
   broadcast threshold, or for two-stage holistic aggregations where no
   build side exists.

Salting mechanics: the probe side gets a uniform salt in [0, n); the build
side is replicated n times (one copy per salt value); the join key becomes
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


def isolated_skew_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    how: str = "inner",
    hot_row_threshold: int = 100_000,
    max_hot_keys: int = 100,
) -> DataFrame:
    """Join with the hot keys isolated: probe rows whose key exceeds
    ``hot_row_threshold`` occurrences are broadcast-joined against just
    their build rows (a map-side join — the skewed slice never shuffles),
    while the long tail takes the normal shuffle join; the two branches
    union.  Result set is identical to ``probe.join(build, on, how)``:
    every probe row lands in exactly one branch, and a build row with a
    hot key can only ever match hot-branch probe rows.

    Detection is one count pass over the probe keys with BOUNDED driver
    state: at most ``max_hot_keys`` keys (by definition of "hot" there
    are few; the cap protects the driver if the threshold is misjudged —
    overflow raises rather than silently broadcasting an unbounded set).
    Detection is driver-side and eager, so reuse the returned DataFrame
    rather than rebuilding it per run.

    Only ``inner`` and ``left`` (probe-side outer) joins are supported:
    a right/full outer would surface unmatched BUILD rows, and a build
    row whose key is hot-but-absent from the hot probe slice would need
    cross-branch bookkeeping to appear exactly once.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"isolated_skew_join supports how='inner'|'left', got {how!r}"
        )
    # NULL-keyed groups stay in the tail branch: a NULL key never equi-
    # matches (no join-side skew possible beyond the probe rows
    # themselves), and F.lit(None) inside the hot-set literal would
    # poison the membership predicate.
    non_null = F.lit(True)
    for c in on:
        non_null = non_null & F.col(c).isNotNull()
    counts = (
        probe.groupBy(*on)
        .count()
        .filter(non_null & (F.col("count") > hot_row_threshold))
        .limit(max_hot_keys + 1)
        .collect()
    )
    if len(counts) > max_hot_keys:
        raise ValueError(
            f"more than {max_hot_keys} keys exceed {hot_row_threshold} "
            "rows; raise hot_row_threshold (or max_hot_keys) so the "
            "broadcast side stays bounded"
        )
    if not counts:
        return probe.join(build, on=on, how=how)
    hot = [tuple(r[c] for c in on) for r in counts]
    key = F.struct(*[F.col(c) for c in on])
    hot_lit = F.array(
        *[F.struct(*[F.lit(v).alias(c) for c, v in zip(on, k)]) for k in hot]
    )
    # coalesce: a NULL key makes array_contains NULL, and both
    # filter(NULL) branches would DROP the row — losing it from a left
    # join.  NULL keys belong to the tail branch.
    is_hot = F.coalesce(F.array_contains(hot_lit, key), F.lit(False))
    hot_joined = probe.filter(is_hot).join(
        F.broadcast(build.filter(is_hot)), on=on, how=how
    )
    rest_joined = probe.filter(~is_hot).join(build, on=on, how=how)
    return hot_joined.unionByName(rest_joined)
