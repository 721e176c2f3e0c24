"""Workload-driven layout recommendation.

At 100 TB the bucket spec is a physical-design decision that should come
from the WORKLOAD, not from a human reading query code: every equi-join
over a lake table is a vote for co-locating that table on its join key,
and the spec worth building is the one the most queries would ride
shuffle-free.  ``recommend_bucket_spec`` derives exactly that from the
registered query library itself:

- build each query's OPTIMIZED logical plan (no execution — pure
  Catalyst),
- walk it for equi-join conditions (`EqualTo` over two
  `AttributeReference`s, including the conjuncts of composite
  conditions),
- resolve each side's attribute to its source scan by exprId against
  the plan's leaves (post-optimization join keys on plain scans keep
  their original attributes; keys derived through expressions simply
  don't resolve — the advisor is deliberately best-effort, it
  recommends layouts, it never claims completeness),
- map the leaf back to a lake table by its file path,
- count votes and emit a ``set_bucket_spec``-shaped dict of every
  (table, key) the workload joins on at least ``min_votes`` times.

The hand-written ``DEFAULT_TPCH_SPEC`` is the human-audited version of
this output; ``tests/test_layout.py`` asserts the advisor recovers it
from the tpch-family queries alone.  CLI: ``bucketize --recommend``.
"""

from __future__ import annotations

import os
from collections import Counter
from collections.abc import Callable, Mapping

from pyspark.sql import SparkSession


def _seq(jseq) -> list:
    """Materialize a Scala Seq through py4j."""
    return [jseq.apply(i) for i in range(jseq.length())]


def _walk_nodes(node):
    yield node
    for child in _seq(node.children()):
        yield from _walk_nodes(child)


def _walk_exprs(expr):
    yield expr
    for child in _seq(expr.children()):
        yield from _walk_exprs(child)


def _leaf_table(leaf, source_dir: str) -> str | None:
    """The lake-table name a plan leaf scans, or None for non-file
    leaves (cached relations, local relations, catalog copies)."""
    try:
        rel = leaf.relation()
        paths = _seq(rel.location().rootPaths())
    except Exception:
        return None
    src = os.path.abspath(source_dir)
    for p in paths:
        sp = str(p)
        if sp.startswith("file:"):
            sp = sp[len("file:"):]
        sp = os.path.abspath(sp)
        if os.path.dirname(sp) != src:
            continue
        base = os.path.basename(sp)
        return base[: -len(".parquet")] if base.endswith(".parquet") else base
    return None


def join_key_votes(
    spark: SparkSession,
    source_dir: str,
    queries: Mapping[str, Callable],
) -> Counter:
    """{(table, key_column): n_queries_joining_on_it} over the workload.
    Queries that fail to build (missing inputs for this source) are
    skipped — the advisor surveys what it can."""
    votes: Counter = Counter()
    for name, fn in queries.items():
        try:
            df = fn(spark, source_dir)
            plan = df._jdf.queryExecution().optimizedPlan()
        except Exception:
            continue
        # exprId -> (table, column) over this plan's file-scan leaves
        attr_src: dict[int, tuple[str, str]] = {}
        for node in _walk_nodes(plan):
            if node.getClass().getSimpleName() != "LogicalRelation":
                continue
            table = _leaf_table(node, source_dir)
            if table is None:
                continue
            for attr in _seq(node.output()):
                attr_src[attr.exprId().id()] = (table, attr.name())
        if not attr_src:
            continue
        pairs: set[tuple[str, str]] = set()
        for node in _walk_nodes(plan):
            if node.getClass().getSimpleName() != "Join":
                continue
            cond = node.condition()
            if not cond.isDefined():
                continue
            for e in _walk_exprs(cond.get()):
                if e.getClass().getSimpleName() != "EqualTo":
                    continue
                sides = _seq(e.children())
                if len(sides) != 2 or any(
                    s.getClass().getSimpleName() != "AttributeReference"
                    for s in sides
                ):
                    continue
                for s in sides:
                    src = attr_src.get(s.exprId().id())
                    if src is not None:
                        pairs.add(src)
        # one vote per query per (table, key) — a query joining twice on
        # the same key still needs the layout only once
        votes.update(pairs)
    return votes


def recommend_bucket_spec(
    spark: SparkSession,
    source_dir: str,
    queries: Mapping[str, Callable],
    min_votes: int = 2,
) -> dict[str, list[list[str]]]:
    """A ``set_bucket_spec``-shaped layout recommendation: for each lake
    table, its join-key columns ordered by workload vote count (most
    joined first = the primary layout), keeping keys with at least
    ``min_votes`` supporting queries."""
    votes = join_key_votes(spark, source_dir, queries)
    spec: dict[str, list[list[str]]] = {}
    ranked = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
    for (table, col), n in ranked:
        if n < min_votes:
            continue
        spec.setdefault(table, []).append([col])
    return spec
