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
