"""Relational operators Spark lacks as built-ins, composed from
DataFrame primitives. The headline one is the **as-of join** — the
canonical time-series operation (match each left row to the latest
right row at-or-before its timestamp).

Spark has no ASOF JOIN; the naive formulation (range join + per-left-row
argmax) is a quadratic disaster. The scalable composition:

    union both sides tagged → ONE window per key ordered by
    (ts, side) → last non-null right payload carried forward → keep
    left rows

One shuffle on the key, one ordered pass — O(n log n) per key, no row
multiplication, no range join. Right-before-left ordering at equal
timestamps gives the standard >= (inclusive) match semantics, identical
to DuckDB's ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts`` (which the
driver oracle uses to verify this bit-for-bit).

Scale: per-key work is a window partition — keys distribute across the
cluster; a single pathologically hot key can be range-bucketed with the
same grouped-prefix-sum trick as drift (functions/stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    how: str = "inner",
    ts_out: str = "asof_ts",
) -> DataFrame:
    """As-of join: each ``left`` row picks up the ``right`` row with the
    greatest ``right_ts`` <= ``left_ts`` for the same key.

    Output: all ``left`` columns + ``ts_out`` (the matched right
    timestamp) + ``right_cols``. ``how='inner'`` drops left rows with no
    prior right row; ``'left'`` keeps them with nulls.

    Right rows should be unique per (key, right_ts); if not, which of
    the tied rows wins is unspecified (same as DuckDB ASOF JOIN).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    rcols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    # The right payload is carried as ONE struct so the match is atomic —
    # carrying columns independently would let null payload fields mix
    # values from different right rows.
    r_payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast("string").alias("__l_marker"),
        r_payload.alias("__r"),
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit("l").alias("__l_marker"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__lc_{i}") for i, c in enumerate(left.columns)],
    )
    r_tagged = r_tagged.select(
        "*",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__lc_{i}")
            for i, c in enumerate(left.columns)
        ],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        *[F.col(f"__lc_{i}") for i in range(len(left.columns))],
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    ).where(F.col("__is_left") == 1)
    if how == "inner":
        carried = carried.where(F.col("__m").isNotNull())
    return carried.select(
        *[
            F.col(f"__lc_{i}").alias(c)
            for i, c in enumerate(left.columns)
        ],
        F.col("__m.__rts").alias(ts_out),
        *[F.col(f"__m.{c}").alias(c) for c in rcols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Range (interval) join: left rows whose numeric ``left_point``
    falls in ``[right_start, right_end)`` for the same key.

    A raw range predicate forces a nested-loop/theta join. The scalable
    composition buckets the axis: each left point lands in ONE bucket,
    each right interval explodes into every bucket it covers, and the
    join becomes an equi-join on (key, bucket) with the exact range
    predicate as a residual filter. Each matching pair appears exactly
    once (the left point's bucket occurs once in the right row's bucket
    list), so no dedup pass is needed.

    ``bucket_width`` should be on the order of typical interval length:
    replication per right row is ``len/width + 1`` buckets.
    """
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_point) / F.lit(bucket_width))
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(bucket_width)),
                F.floor(F.col(right_end) / F.lit(bucket_width)),
            )
        ),
    )
    cond = [lb[c] == rb[c] for c in on] + [
        lb["__bucket"] == rb["__bucket"],
        lb[left_point] >= rb[right_start],
        lb[left_point] < rb[right_end],
    ]
    joined = lb.join(rb, cond, "inner")
    return joined.select(
        *[lb[c] for c in left.columns],
        *[rb[c] for c in right.columns if c not in on],
    )


def sessionize(
    df: DataFrame,
    key: list[str],
    ts_col: str,
    gap: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: rows of the same key belong to one
    session while consecutive timestamps are < ``gap`` apart (numeric
    axis — convert timestamps with ``unix_micros`` first).

    Classic two-window composition, both over the SAME (key, ts)
    ordering so Catalyst plans one sort: a new-session flag via ``lag``,
    then a running sum of flags as the session ordinal. Output: input
    columns + ``session_col`` (1-based per key).
    """
    w = Window.partitionBy(*key).orderBy(ts_col)
    flag = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) >= F.lit(gap), 1
    ).otherwise(0)
    run = Window.partitionBy(*key).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", flag).withColumn(
        session_col, (F.sum("__new").over(run) + 1).cast("long")
    ).drop("__new")


def scd2_intervals(
    df: DataFrame,
    key: str,
    status_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each key's
    ordered status stream to CHANGE points and assign half-open
    [valid_from, valid_to) validity intervals; the open-ended current
    row is flagged ``is_current = 1``.

    Output: (key, status, valid_from, valid_to, is_current). Both
    window passes (lag to find changes, lead to close intervals) share
    the same ``key`` partitioning, so the whole build is ONE shuffle of
    (key, ts) pairs — the standard CDC -> warehouse history-table
    materialization.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    ordered = df.select(
        key,
        F.col(status_col).alias("status"),
        ts_col,
        tiebreak_col,
        F.lag(status_col).over(w).alias("__prev"),
    )
    changes = ordered.where(
        F.col("__prev").isNull() | (F.col("__prev") != F.col("status"))
    ).select(
        key, "status", F.col(ts_col).alias("valid_from"), tiebreak_col
    )
    w2 = Window.partitionBy(key).orderBy("valid_from", tiebreak_col)
    nxt = F.lead("valid_from").over(w2)
    return changes.select(
        key,
        "status",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


__all__ = ["asof_join", "interval_join", "scd2_intervals", "sessionize"]


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    how: str = "inner",
    ts_out: str = "near_ts",
) -> DataFrame:
    """Nearest-neighbor as-of join: each ``left`` row picks up the
    ``right`` row minimizing ``abs(right_ts - left_ts)`` within the same
    key; exact-distance ties prefer the earlier (at-or-before) match,
    so semantics degrade gracefully to the plain backward as-of.

    Built as the same union-tag composition as :func:`asof_join`, but
    with TWO ordered window passes over the one unioned frame — an
    ascending pass carrying the latest right payload at-or-before each
    row, and a descending pass carrying the earliest right payload
    at-or-after — then a per-row distance comparison. One shuffle on the
    key, two sorts that share the exchange; still no range join and no
    row multiplication.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join_nearest supports inner/left, got {how!r}")
    rcols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    r_payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        r_payload.alias("__r"),
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__lc_{i}") for i, c in enumerate(left.columns)],
    )
    r_tagged = r_tagged.select(
        "*",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__lc_{i}")
            for i, c in enumerate(left.columns)
        ],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Backward: right sorts before left at equal ts (inclusive >=).
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward: descending ts, right still first at equal ts (inclusive <=).
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        "__ts",
        *[F.col(f"__lc_{i}") for i in range(len(left.columns))],
        F.last("__r", ignorenulls=True).over(w_back).alias("__mb"),
        F.last("__r", ignorenulls=True).over(w_fwd).alias("__mf"),
    ).where(F.col("__is_left") == 1)
    d_back = F.col("__ts") - F.col("__mb.__rts")
    d_fwd = F.col("__mf.__rts") - F.col("__ts")
    pick_back = F.col("__mb").isNotNull() & (
        F.col("__mf").isNull() | (d_back <= d_fwd)
    )
    chosen = carried.select(
        *[F.col(f"__lc_{i}") for i in range(len(left.columns))],
        F.when(pick_back, F.col("__mb")).otherwise(F.col("__mf")).alias("__m"),
    )
    if how == "inner":
        chosen = chosen.where(F.col("__m").isNotNull())
    return chosen.select(
        *[
            F.col(f"__lc_{i}").alias(c)
            for i, c in enumerate(left.columns)
        ],
        F.col("__m.__rts").alias(ts_out),
        *[F.col(f"__m.{c}").alias(c) for c in rcols],
    )
