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
