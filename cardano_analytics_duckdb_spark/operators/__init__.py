"""Query library.  Each submodule exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLE:  dict[str, str]`` — DuckDB-runnable SQL with identical output
  columns (same names, same aliasing) for hash-comparison.

``all_queries()`` / ``all_oracles()`` merge every submodule for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLE)
    return out


def _modules():
    from ..streaming import windows as stream_windows
    from . import (
        analytic,
        cardano,
        dedup,
        graph,
        multimodal,
        relational,
        reports,
        similarity,
        temporal,
        textops,
        windows,
    )

    return [
        relational,
        analytic,
        windows,
        temporal,
        dedup,
        similarity,
        textops,
        multimodal,
        cardano,
        reports,
        graph,
        stream_windows,
    ]
