"""Bech32 (BIP-173) address decoding as pure Catalyst expressions.

The reference declares ``bech32`` as a dependency but never imports it
(/root/reference/pyproject.toml:8) — address decoding is its last
intended-but-unbuilt capability.  Here the decode runs entirely JVM-side
with higher-order functions (transform/aggregate/sequence inside
whole-stage codegen): no Python UDF, no per-row interpreter hop, so it
vectorizes over a 100 TB address column like any other string expression.

Pieces (each returns a SQL expression string over named input columns, to
be composed via ``selectExpr`` stages):

- charset mapping  char → 5-bit value (``instr`` against the constant)
- HRP expansion    [ord>>5 ...] ++ [0] ++ [ord&31 ...]
- checksum         BIP-173 polymod as an ``aggregate`` fold with the five
                   generator constants inlined
- bit regrouping   5-bit groups → bytes via closed-form bit indexing
                   (byte i, bit b comes from group (8i+b)/5, shift
                   4-(8i+b)%5), avoiding any stateful carry loop

Cardano semantics on top (CIP-19): payload byte 0 is the header (type in
the high nibble, network id in the low), bytes 1-28 the payment
credential, bytes 29-56 the optional stake credential.
"""

from __future__ import annotations

CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"

# BIP-173 generator constants (decimal for SQL inlining)
_GEN = (996825010, 642813549, 513874426, 1027748829, 705979059)


def hrp_expr(address_col: str) -> str:
    """Human-readable part: everything before the LAST '1' separator (the
    bech32 charset excludes '1', so the last '1' is always the separator)."""
    return f"regexp_replace({address_col}, '1[^1]*$', '')"


def datapart_expr(address_col: str) -> str:
    return f"regexp_replace({address_col}, '^.*1', '')"


def _chars_expr(col: str, body: str) -> str:
    """``transform`` over the 1..length(col) character positions, guarded
    for the empty string: Spark's ``sequence(1, 0)`` DESCENDS to [1, 0]
    (step defaults to -1), which would fabricate two phantom characters —
    the guard returns a true empty array instead, matching the spec and
    the DuckDB oracle's ``generate_series`` semantics."""
    return (
        f"if(length({col}) = 0, array(),"
        f" transform(sequence(1, length({col})), i -> {body}))"
    )


def values_expr(datapart_col: str) -> str:
    """Data characters → 5-bit values; unknown characters map to -1 so
    validity is checkable with array_min >= 0."""
    return _chars_expr(
        datapart_col,
        f"instr('{CHARSET}', substring({datapart_col}, i, 1)) - 1",
    )


def hrp_expand_expr(hrp_col: str) -> str:
    high = _chars_expr(
        hrp_col, f"shiftright(ascii(substring({hrp_col}, i, 1)), 5)"
    )
    low = _chars_expr(hrp_col, f"ascii(substring({hrp_col}, i, 1)) & 31")
    return f"concat({high}, array(0), {low})"


def polymod_expr(hrp_ex_col: str, values_col: str) -> str:
    """BIP-173 polymod over hrp_expand ++ values; == 1 iff valid bech32.

    chk stays under 2^30 (25 masked bits shifted by 5), so INT arithmetic
    never overflows.
    """
    gen_terms = " ^ ".join(
        f"if((shiftright(chk, {25 + i}) & 1) = 1, {g}, 0)"
        for i, g in enumerate(_GEN)
    )
    return (
        f"aggregate(concat({hrp_ex_col}, {values_col}), 1,"
        f" (chk, v) -> (shiftleft(chk & 33554431, 5) ^ v) ^ {gen_terms})"
    )


def payload5_expr(values_col: str) -> str:
    """5-bit payload groups: the data values minus the 6-group checksum."""
    return f"slice({values_col}, 1, greatest(size({values_col}) - 6, 0))"


def payload_bytes_expr(p5_col: str) -> str:
    """5-bit groups → bytes (convertbits 5→8, pad=false): byte i's bit b is
    bit (8i+b) of the concatenated stream — group (8i+b)/5, shift
    4-(8i+b)%5.  Closed-form per byte keeps it a pure transform."""
    nbytes = f"cast((size({p5_col}) * 5) div 8 as int)"
    byte = (
        "aggregate(sequence(0, 7), 0, (acc, b) -> acc * 2 + "
        f"(shiftright(element_at({p5_col}, cast((8*i + b) div 5 as int) + 1),"
        " cast(4 - (8*i + b) % 5 as int)) & 1))"
    )
    return (
        f"if({nbytes} > 0,"
        f" transform(sequence(0, {nbytes} - 1), i -> {byte}),"
        " array())"
    )


def bytes_hex_expr(bytes_slice: str) -> str:
    """array<int> of byte values → lowercase hex string."""
    return (
        f"concat_ws('', transform({bytes_slice},"
        " x -> lower(lpad(hex(x), 2, '0'))))"
    )
