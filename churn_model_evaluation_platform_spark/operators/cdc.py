"""Change-data-capture application: MERGE a keyed insert/update/delete
changelog into a snapshot (SCD type-1 upsert) as one lazy Spark plan.

The reference platform rebuilds its metrics store by append-only writes
(churn_prediction_pipeline.py:78-84, 935-double-write); a 100 TB data
platform additionally needs the *compaction* side — folding a CDC
stream back into the dimension snapshot. This is Delta/Iceberg
``MERGE INTO`` semantics expressed with vanilla DataFrame ops so it
works against plain parquet.

Scale notes:
- "Latest change per key" is a ``groupBy(key).agg(max(struct(...)))``
  — an aggregate with map-side partial combine, NOT a global
  ``row_number`` window: no single fat partition when one key is hot,
  and the shuffle carries one row per (mapper, key), not the raw log.
- The merge itself is one full-outer shuffle join on the key; both
  sides hash-partition on the same key so AQE can coalesce.
- Delete = filter after the join (no second pass), insert = right-only
  rows surviving the same join. One shuffle total beyond the agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Collapse a changelog to the winning (latest) change per key.

    ``order_cols`` must totally order changes within a key (e.g. a
    change timestamp plus a unique log sequence number); the struct-max
    compares them positionally, so later fields only break ties of
    earlier ones.
    """
    payload = [
        c
        for c in changes.columns
        if c not in set(keys) | set(order_cols) | {op_col}
    ]
    packed = F.max(
        F.struct(
            *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(c) for c in payload],
        )
    ).alias("_last")
    flat = changes.groupBy(*keys).agg(packed)
    return flat.select(
        *keys,
        F.col("_last._op").alias(op_col),
        *[F.col(f"_last.{c}").alias(c) for c in payload],
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    upsert_op: str = "U",
) -> DataFrame:
    """Apply a keyed changelog to ``snapshot`` (SCD1 MERGE).

    Semantics per key, using only the latest change (by ``order_cols``):
    - ``delete_op``: key disappears from the result;
    - ``upsert_op``: payload columns shared with the snapshot take the
      change's value; a key absent from the snapshot is inserted
      (snapshot-only columns come out NULL for inserts);
    - no change: snapshot row passes through untouched.

    Column contract: the result has exactly the snapshot's columns.
    """
    last = latest_changes(changes, keys, order_cols, op_col=op_col)
    value_cols = [c for c in last.columns if c not in set(keys) | {op_col}]
    joined = snapshot.join(last, on=keys, how="full_outer")
    survives = F.col(op_col).isNull() | (F.col(op_col) != delete_op)
    out_cols = []
    for c in snapshot.columns:
        if c in keys:
            out_cols.append(F.col(c))
        elif c in value_cols:
            out_cols.append(
                F.when(F.col(op_col) == upsert_op, last[c])
                .otherwise(snapshot[c])
                .alias(c)
            )
        else:
            out_cols.append(snapshot[c].alias(c))
    return joined.where(survives).select(*out_cols)
