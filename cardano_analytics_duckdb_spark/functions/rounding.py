"""Cross-engine deterministic rounding.

Spark's ``round()`` rounds the *shortest decimal rendering* of a double
(HALF_UP on ``BigDecimal.valueOf``), while DuckDB rounds the *binary* value,
so a true value of 4.475 (stored as 4.47499999999999964) rounds to 4.48 in
Spark but 4.47 in DuckDB — a hash-mismatch generator on any ``avg``/``sum``.

``rnd``/``rnd_sql`` sidestep engine semantics entirely: both engines compute
``floor(x * 10^n + 0.5) / 10^n`` with identical IEEE-754 double ops, so the
results are bit-identical by construction.

Contract domain: bit-stability requires ``|x|·10ⁿ < 2^53`` (beyond that,
doubles can't represent consecutive integers and the engines' floor/division
orders can differ in the last ulp — property-tested at the boundary in
tests/test_properties.py).  Every rounded quantity in this engine is orders
of magnitude inside the domain; revisit if aggregating raw lovelace sums at
full-chain scale before dividing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column, n: int) -> Column:
    """Round half-up at n decimals, bit-identical across Spark and DuckDB."""
    scale = float(10**n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def rnd_sql(expr: str, n: int) -> str:
    """The DuckDB-side rendering of the same rounding formula."""
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def cent_sum(col: Column) -> Column:
    """Order-independent 2-decimal sum: quantize each term to integer cents
    (bit-identical per row — same IEEE double ops in both engines), sum as
    exact int64, divide once at the end.

    ``rnd(F.sum(x), 2)`` is only reproducible up to the ulp of the float
    sum, which depends on partition/accumulation ORDER — fine within one
    engine, but Spark and DuckDB add in different orders, and with many
    output groups one of them eventually lands on a .005 rounding boundary
    (observed: nation_pair_volume at sf0.01, 285207.03 vs .04).  Integer
    summation is associative, so the result is independent of both engine
    and parallelism.  Domain: per-group cent totals < 2^53.
    """
    return (
        F.sum(F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long"))
        / F.lit(100.0)
    )


def cent_sum_sql(expr: str) -> str:
    """DuckDB rendering of :func:`cent_sum`."""
    return f"sum(cast(floor(({expr}) * 100.0 + 0.5) AS BIGINT)) / 100.0"
