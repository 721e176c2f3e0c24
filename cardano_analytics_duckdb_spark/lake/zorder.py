"""Z-order (Morton-curve) clustered parquet writer.

Why this exists: at 100 TB, scan pruning is the difference between touching
terabytes and touching gigabytes.  Parquet readers prune row groups / files
with footer min-max statistics, but a linear sort makes those statistics
tight on ONE column only — a predicate on any other column still reads
everything.  Interleaving the bits of several columns into one Morton key
and range-partitioning + sorting on it keeps every clustered column's
min-max span per file at roughly ``span / files^(1/n_cols)``, so a
multi-dimensional box predicate prunes on EVERY clustered dimension
(the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

The whole path is declarative Catalyst expressions — the Morton key is a
fold of shift/mask/or terms inside whole-stage codegen, the layout is one
``repartitionByRange`` + partition-local sort (a single range shuffle), and
the key column is dropped before the write so the on-disk schema is
unchanged.  No UDFs, no driver-side loops; the only driver action is the
2-row min/max bounds aggregate used to scale columns onto the grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(cols: list[Column], bits: int) -> Column:
    """Bit-interleave ``cols`` (each already an integer in ``[0, 2**bits)``)
    into one long: bit ``b`` of column ``i`` lands at position ``b*n + i``."""
    n = len(cols)
    # every bit position must stay inside a signed 64-bit long: JVM
    # shiftleft masks the shift count mod 64, so an over-wide config would
    # SILENTLY fold high columns onto low bits and break injectivity
    if n * bits > 63:
        raise ValueError(
            f"morton_interleave: {n} cols × {bits} bits = {n * bits} bit"
            " positions > 63 — reduce bits (or cluster fewer columns)"
        )
    z: Column | None = None
    for b in range(bits):
        for i, c in enumerate(cols):
            term = F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)).cast("long"),
                b * n + i,
            )
            z = term if z is None else z.bitwiseOR(term)
    assert z is not None
    return z


#: Bytes of binary prefix folded into the numeric z-order coordinate.
#: 7 bytes = 56 bits < 63, so the fixed-width-hex -> conv(16, 10) path
#: always fits a signed long.
_BIN_PREFIX_BYTES = 7


def _binary_coord(c: str) -> Column:
    """Order-preserving numeric coordinate of a BINARY column: the
    left-justified first ``_BIN_PREFIX_BYTES`` bytes via fixed-width hex.
    hex() preserves bytewise order (2 chars per byte), right-padding with
    '0' (the lowest hex digit) left-justifies shorter values, and conv()
    of a fixed-width hex string is monotone — so numeric order on the
    coordinate equals bytewise order on the prefix.  Values that share a
    prefix land on the same grid cell, which costs skipping precision,
    never correctness (the manifest prunes on real footer stats)."""
    w = 2 * _BIN_PREFIX_BYTES
    return F.conv(
        F.rpad(F.substring(F.hex(F.col(c)), 1, w), w, "0"), 16, 10
    ).cast("long")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
) -> Column:
    """Morton key over ``cols``, linearly scaled onto a ``2**bits`` grid.

    The scaling bounds come from one tiny min/max aggregate (2 values per
    column to the driver — bounded regardless of table size).  ``bits`` is
    auto-reduced so the key always fits a signed long; an empty (or
    all-NULL-column) frame degenerates to a constant key, which writes the
    same empty/unordered output a sort would.

    BINARY columns cluster too (r9): their coordinate is the
    order-preserving numeric prefix of :func:`_binary_coord`, so a
    policy/asset-id dimension can share the curve with a numeric slot
    dimension — the layout the flagship's conjunctive box prune
    (``lake/manifest.py::prune_files_box`` over hex bounds) skips on.
    """
    from pyspark.sql import types as T

    bits = min(bits, 63 // max(len(cols), 1))
    is_bin = {
        c: isinstance(df.schema[c].dataType, T.BinaryType) for c in cols
    }
    coord = {
        c: (_binary_coord(c) if is_bin[c] else F.col(c).cast("double"))
        for c in cols
    }
    aggs = [F.min(coord[c]).alias(f"lo_{c}") for c in cols] + [
        F.max(coord[c]).alias(f"hi_{c}") for c in cols
    ]
    stats = df.agg(*aggs).first()
    if any(stats[f"lo_{c}"] is None or stats[f"hi_{c}"] is None for c in cols):
        return F.lit(0).cast("long")
    grid = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo = float(stats[f"lo_{c}"])
        hi = float(stats[f"hi_{c}"])
        span = max(hi - lo, 1.0)
        scaled.append(
            F.floor(
                (coord[c].cast("double") - lo) / span * grid
            ).cast("long")
        )
    return morton_interleave(scaled, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    out_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of ``cols``.

    One range shuffle on the key gives both the file assignment and (via
    the partition-local sort) tight within-file row-group statistics; the
    key never reaches disk.
    """
    (
        df.withColumn("_zval", zorder_key(df, cols, bits))
        .repartitionByRange(out_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )
