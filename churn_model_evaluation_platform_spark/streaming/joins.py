"""Stream-stream joins (Structured Streaming's hardest primitive).

Joining two unbounded streams requires both sides to buffer state; the
watermark + time-range condition bound that state: a row can only match
rows within the interval, so state older than the watermark minus the
bound is evicted. Without the time bound the state store grows forever
— Spark rejects inner stream-stream joins lacking watermarks on both
sides for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on a key, matching rows whose event times are
    within ``within`` of each other (right.ts in [left.ts - within,
    left.ts]). Both sides get ``watermark`` so the join state is
    bounded: buffered rows older than watermark + within are evicted.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - interval {within}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, how)


__all__ = ["stream_stream_join"]
