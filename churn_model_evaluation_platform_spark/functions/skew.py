"""Skew mitigation for joins whose hot keys AQE cannot save.

AQE's skew-join splitting (on by default, session.py) handles most skew
by splitting oversized shuffle partitions. Salting is the explicit
fallback for the pathological case — a handful of keys carrying a large
share of all rows joined against a side that is too big to broadcast:

- the SKEWED side gets a per-row salt in [0, salt);
- the OTHER side is replicated once per salt value (explode);
- the join key becomes (key, salt) → hot keys spread over ``salt``
  reducers instead of one.

Replication multiplies the other side by ``salt`` — use only when that
side is much smaller than the skewed side (but not broadcast-small,
which would need no salting at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with key salting.

    Result equals ``skewed.join(other, on, how)`` for inner/left joins
    (verified in tests). The salt is derived deterministically from the
    full row (xxhash64) so task retries re-salt identically — `rand()`
    would not survive partition recomputation.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    s = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    o = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = s.join(o, on + [SALT_COL], how)
    return out.drop(SALT_COL)


__all__ = ["SALT_COL", "salted_join"]
