"""Z-order (Morton) interleaving — multi-dimensional data clustering.

Sorting/range-partitioning a table by the interleaved bits of two join/
filter columns places rows close in BOTH dimensions into the same file,
so parquet footer min/max stats prune scans for predicates on EITHER
column — the layout trick behind Delta's OPTIMIZE ZORDER BY and
Iceberg's z-ordering, built here from plain bit arithmetic so it works
on any Spark table.

Everything is shiftleft/AND on longs — whole-stage-codegen'd JVM
expressions with exact cross-engine parity (bit ops have no float
noise), so a DuckDB oracle can verify the assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic-number bit spreading: insert a 0 between every bit of a 16-bit
# value (the classic "Interleave bits by Binary Magic Numbers" bithack).
_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` to even bit positions 0,2,..,30."""
    v = x.bitwiseAND(F.lit(0xFFFF)).cast("long")
    for shift, mask in _SPREAD_MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def spread_bits16_sql(expr: str) -> str:
    """The identical spreading as a SQL string (DuckDB-compatible)."""
    v = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_MASKS:
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


def morton_interleave(x: Column, y: Column) -> Column:
    """Morton code of two 16-bit values: x on even bits, y on odd."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


def morton_interleave_sql(x_expr: str, y_expr: str) -> str:
    return (
        f"({spread_bits16_sql(x_expr)} | "
        f"({spread_bits16_sql(y_expr)} << 1))"
    )


def morton_interleave_n(cols: list[Column], bits: int | None = None) -> Column:
    """Morton code of ``n`` dimensions: bit ``b`` of dimension ``d``
    lands at position ``b*n + d`` (the n-ary generalization of the
    2-D even/odd interleave — column 0 gets the LOW lane, matching
    ``morton_interleave``'s x-on-even-bits convention). Delta's
    OPTIMIZE ZORDER BY accepts any column count; this is the same
    surface.

    ``bits`` defaults to the most resolution that fits a signed long:
    ``min(16, 63 // n)`` bits per dimension (n=2 → 16, matching the
    2-D path's domain; n=3 → 16 → 48 bits; n=4 → 15). Values are
    masked into that many low bits — callers pre-scale each dimension
    into ``0 .. 2^bits - 1`` exactly as in the 2-D API. The expansion
    is ``bits × n`` shift/AND/OR terms — all long arithmetic inside
    whole-stage codegen, with exact cross-engine parity (no float
    noise), same as the magic-mask 2-D path."""
    n = len(cols)
    if n < 2:
        raise ValueError("morton_interleave_n needs at least 2 columns")
    if bits is None:
        bits = min(16, 63 // n)
    if bits < 1 or bits * n > 63:
        raise ValueError(f"bits={bits} with {n} dims exceeds a signed long")
    if n == 2 and bits == 16:
        return morton_interleave(cols[0], cols[1])
    z: Column | None = None
    for d, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + d
            )
            z = term if z is None else z.bitwiseOR(term)
    return z


def morton_interleave_n_sql(exprs: list[str], bits: int | None = None) -> str:
    """The identical n-ary interleave as a SQL string (DuckDB-
    compatible) — the oracle side of ``morton_interleave_n``."""
    n = len(exprs)
    if bits is None:
        bits = min(16, 63 // n)
    terms = []
    for d, e in enumerate(exprs):
        v = f"(({e}) & {(1 << bits) - 1})"
        for b in range(bits):
            terms.append(f"((({v} >> {b}) & 1) << {b * n + d})")
    return "(" + " | ".join(terms) + ")"


def zorder_by_n(
    df: DataFrame,
    cols: list[Column | str],
    num_partitions: int | None = None,
    bits: int | None = None,
) -> DataFrame:
    """``zorder_by`` for any number of dimensions: range-partition +
    intra-partition sort on the n-ary Morton code."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = morton_interleave_n(cs, bits=bits).alias("__z")
    parts = [num_partitions] if num_partitions else []
    return (
        df.withColumn("__z", z)
        .repartitionByRange(*parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_by(
    df: DataFrame, x: Column | str, y: Column | str, num_partitions: int | None = None
) -> DataFrame:
    """Cluster ``df`` by the Morton code of two columns: range-partition
    + intra-partition sort on the z-value, so a partition-per-file write
    yields tight min/max envelopes in both dimensions.

    Scale: ``repartitionByRange`` samples the z distribution to pick
    balanced boundaries (one extra scan-only job, same as any global
    sort); the sort itself is per-partition. Callers write the result
    with ``partitionBy``-free parquet and rely on footer stats pruning.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    z = morton_interleave(xc, yc).alias("__z")
    parts = [num_partitions] if num_partitions else []
    return (
        df.withColumn("__z", z)
        .repartitionByRange(*parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
