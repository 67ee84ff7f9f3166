"""Time-series resampling: OHLC (open/high/low/close) bar aggregation.

The reference's dashboards plot metric timeseries by raw point
(churn-model-evaluation.json timeseries panels); resampling an event
stream into fixed bars is the standard way to keep those panels O(bars)
instead of O(events) when the store holds years of history.

Scale notes: one ``groupBy(key, bucket)`` aggregate — map-side partial
``min_by/max_by/min/max/count`` combine, a single shuffle of one row per
(mapper, key, bucket). No window function, no sort: open/close are
``min_by/max_by`` over a totally-ordered tie-broken key, so the result
is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Added to (epoch_us, tiebreak) before '%020d' formatting so negative
# values order correctly; 2^62 keeps any realistic sum inside int64.
_ORD_BIAS = 1 << 62


def ohlc_bars(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Per (keys..., bar_ts): open, high, low, close, volume.

    ``bucket`` is a ``date_trunc`` unit. ``tiebreak_col`` must be
    unique per row (an event/sequence id): open/close at duplicated
    timestamps are then well-defined — smallest (ts, tiebreak) wins
    open, largest wins close — instead of partitioning-dependent.
    """
    # Zero-padded fixed-width string → lexicographic order == numeric
    # order on (epoch_us, tiebreak); a plain scalar every engine can
    # order identically (differential-check friendly, and cheap).
    # Both fields are biased by 2^62 into the non-negative range first:
    # '%020d' on a NEGATIVE value (pre-1970 timestamps, signed ids)
    # prints a '-' sign that sorts before digits AND reverses within the
    # negatives, silently breaking the ordering contract (ADVICE r6).
    # Valid for |epoch_us| and |tiebreak| < 2^62 — ±146k years.
    ordk: Column = F.format_string(
        "%020d|%020d",
        F.unix_micros(F.col(ts_col)) + F.lit(_ORD_BIAS),
        F.col(tiebreak_col) + F.lit(_ORD_BIAS),
    )
    return (
        df.groupBy(
            *keys, F.date_trunc(bucket, F.col(ts_col)).alias("bar_ts")
        )
        .agg(
            F.min_by(F.col(value_col), ordk).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), ordk).alias("close"),
            F.count("*").alias("volume"),
        )
    )
