"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no cross-batch state (each S3 drop is scored
independently; churn_prediction_pipeline.py:813-905) — but a monitoring
engine at 100 TB needs running aggregates that survive micro-batches
(e.g. cumulative per-segment score counts feeding the drift dashboard
without re-scanning history). This is the Structured Streaming way:
keyed state in the state store, one Arrow batch per key per trigger,
incremental updates only — no recomputation over historical data.

Scale posture: state is partitioned by the grouping key across the
cluster's state stores (RocksDB-backed in production configs); each
micro-batch shuffles only that batch's rows on the key — history is
never re-read. The pandas function sees one key group at a time, so
driver memory is never a function of total key cardinality.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)

_STATE = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def running_user_stats(stream_df: DataFrame) -> DataFrame:
    """Running per-user (count, sum) across micro-batches.

    Input: a streaming DataFrame with ``user_id`` and ``value`` columns.
    Output stream: ``(user_id, n_events, total_value)`` — the cumulative
    figures as of each trigger. State never expires (NoTimeout): the
    reference's metrics table is likewise append-forever.

    The update function is a CLOSURE on purpose: cloudpickle ships it by
    value, so Python workers don't need this package importable (a
    module-level function would pickle by reference and fail on drivers
    whose cwd isn't the repo).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # fold this trigger's rows for one key into (n, total) state and
        # emit the updated running totals — one row per key per batch
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        stream_df.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_OUTPUT,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


__all__ = ["RUNNING_STATS_OUTPUT", "running_user_stats"]
