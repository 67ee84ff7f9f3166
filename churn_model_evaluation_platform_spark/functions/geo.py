"""Geospatial primitives from pure Spark expressions: geohash encoding
(the public base32 interleave algorithm) and haversine distance — the
building blocks of the blocked spatial join in registry_ext10.

Everything is bit arithmetic + libm trig inside whole-stage codegen; the
geohash is exact cross-engine (integer ops only), haversine is rounded
where the differential oracle compares it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# 64-bit magic-number spread: insert a 0 between every bit of a 32-bit
# value (positions 0,2,4,..,62).
_SPREAD64_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread32(x: Column) -> Column:
    v = x.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD64_MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _spread32_sql(expr: str) -> str:
    v = f"(({expr}) & {0xFFFFFFFF})"
    for shift, mask in _SPREAD64_MASKS:
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


def geohash(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Standard geohash string: lat/lon quantized to ``5*precision/2``
    bits each, bit-interleaved longitude-first, base32-encoded."""
    nbits = (5 * precision + 1) // 2  # bits per dimension
    x = F.floor((lon + 180.0) / 360.0 * F.lit(float(1 << nbits))).cast("long")
    y = F.floor((lat + 90.0) / 180.0 * F.lit(float(1 << nbits))).cast("long")
    # clamp the lat=90/lon=180 edge into the top cell
    x = F.least(x, F.lit((1 << nbits) - 1))
    y = F.least(y, F.lit((1 << nbits) - 1))
    z = _spread32(y).bitwiseOR(F.shiftleft(_spread32(x), 1))
    total = 5 * precision
    chars = [
        F.substring(
            F.lit(_B32),
            (
                F.shiftrightunsigned(z, total - 5 * (i + 1))
                .bitwiseAND(F.lit(31))
                .cast("int")
                + 1
            ),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 8) -> str:
    """The identical geohash as a SQL string (DuckDB-compatible)."""
    nbits = (5 * precision + 1) // 2
    x = f"least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {float(1 << nbits)}) AS BIGINT), {(1 << nbits) - 1})"
    y = f"least(CAST(floor((({lat_expr}) + 90.0) / 180.0 * {float(1 << nbits)}) AS BIGINT), {(1 << nbits) - 1})"
    z = f"({_spread32_sql(y)} | ({_spread32_sql(x)} << 1))"
    total = 5 * precision
    chars = [
        f"substr('{_B32}', CAST((({z} >> {total - 5 * (i + 1)}) & 31) AS INT) + 1, 1)"
        for i in range(precision)
    ]
    return "concat(" + ", ".join(chars) + ")"


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (R = 6371)."""
    rad = 0.017453292519943295  # pi / 180
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(lat1 * rad)
        * F.cos(lat2 * rad)
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return 2 * 6371.0 * F.asin(F.sqrt(a))


HAVERSINE_KM_SQL = (
    "2 * 6371.0 * asin(sqrt("
    "pow(sin(({lat2} - {lat1}) * 0.017453292519943295 / 2), 2)"
    " + cos(({lat1}) * 0.017453292519943295)"
    " * cos(({lat2}) * 0.017453292519943295)"
    " * pow(sin(({lon2} - {lon1}) * 0.017453292519943295 / 2), 2)))"
)
