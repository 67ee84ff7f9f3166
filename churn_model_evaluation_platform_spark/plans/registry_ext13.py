"""Round-9 registry extensions: distributed txn-table planning
(partition layout + file-index pruning as a Spark filter), the change
feed out of the table, and the write-time ANN encodings.

VERDICT r8 "next round" items 1, 2, 4, 7 — each as an exact-oracled
query. Same conventions as registry.py: every computed column aliased
identically on both engines; integer aggregates cast to BIGINT on the
DuckDB side (HUGEINT hash trap).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _tmp_table_path(sf_dir: str, tag: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/spark_graft_{tag}_{base}"
    shutil.rmtree(path, ignore_errors=True)
    return path


# ---------------------------------------------------------------------------
# txnlog_partition_pruning — Hive-layout partition pruning through the
# DISTRIBUTED planner: the table is partitioned by the 5-day ingest
# bucket (partition_by=["bucket"]), committed in ONE append whose
# partitionBy write lands one directory per bucket (coalesce(1) → one
# file each), then scanned with a bucket predicate through
# scan(distributed=True) — pruning computed as a Spark filter over the
# file_index() snapshot, not a driver loop (VERDICT r8 next #1). The
# oracle predicts BOTH the aggregate (pruning + residual filter must
# equal a plain filter; the value predicate is residual-only) AND the
# files_scanned count: one file per distinct bucket among the matching
# bucket range — an arithmetic fact about dense per-day data,
# independent of the engine. Reference analog: the engine's 100 TB
# partition-pruning posture (BASELINE.json); Delta's partition-column
# data skipping.
# ---------------------------------------------------------------------------

_PARTPRUNE_SQL = """
WITH ev AS (
  SELECT event_type, value,
         least(CAST(floor((day(ts) - 1) / 5) AS BIGINT), 5) AS bucket
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       (SELECT CAST(count(DISTINCT bucket) AS BIGINT) FROM ev
        WHERE bucket BETWEEN 1 AND 2) AS files_scanned
FROM ev
WHERE bucket BETWEEN 1 AND 2 AND value >= 10.0
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# txnlog_table_changes — the CDC feed OUT of the txn table (VERDICT r8
# next #2): six 5-day appends (v1..v6), then a CoW DELETE of a 4-day
# range (v7), read back as table_changes(from_version=4). The oracle
# replays the commit arithmetic row-for-row: v5/v6 contribute their
# buckets as inserts; v7 deletes ALL rows of the two files the
# stats-pruned CoW rewrite touched (buckets 1-2 — file granularity is
# the documented contract of CDC-by-file-diff) and re-inserts their
# surviving rows. Any feed bug — a missed commit, wrong granularity,
# data_change leak, wrong version stamp — breaks the hash.
# ---------------------------------------------------------------------------

_SKIP_LO, _SKIP_HI = "2024-01-08", "2024-01-12"

_TABLE_CHANGES_SQL = f"""
WITH ev AS (
  SELECT event_type, value, ts,
         CAST(floor((day(ts) - 1) / 5) AS BIGINT) AS b
  FROM events WHERE day(ts) <= 30
),
changes AS (
  SELECT 'insert' AS _change_type, 5 AS _commit_version, event_type, value
  FROM ev WHERE b = 4
  UNION ALL
  SELECT 'insert', 6, event_type, value FROM ev WHERE b = 5
  UNION ALL
  SELECT 'delete', 7, event_type, value FROM ev WHERE b IN (1, 2)
  UNION ALL
  SELECT 'insert', 7, event_type, value FROM ev
  WHERE b IN (1, 2)
    AND NOT (ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
             AND ts < TIMESTAMP '{_SKIP_HI} 00:00:00')
)
SELECT _change_type,
       CAST(_commit_version AS BIGINT) AS _commit_version,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM changes
GROUP BY _change_type, _commit_version, event_type
"""


@register("txnlog_table_changes", _TABLE_CHANGES_SQL)
def q_txnlog_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_ext12 import _six_bucket_table

    t = _six_bucket_table(spark, sf_dir, "txncdc")  # v1..v6 appends
    t.delete([("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)])  # v7 CoW
    return (
        t.table_changes(from_version=4)
        .groupBy("_change_type", "_commit_version", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register("txnlog_partition_pruning", _PARTPRUNE_SQL)
def q_txnlog_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "txnpart")
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            "value",
            F.least(
                F.floor((F.dayofmonth("ts") - 1) / 5).cast("long"),
                F.lit(5).cast("long"),
            ).alias("bucket"),
        )
        .coalesce(1)
    )
    t = TxnTable(spark, path, partition_by=["bucket"])
    t.append(ev)
    where = [("bucket", "between", (1, 2)), ("value", ">=", 10.0)]
    scanned = t.prune_report(
        [("bucket", "between", (1, 2))], distributed=True
    )["kept"]
    return (
        t.scan(where, distributed=True)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("files_scanned", F.lit(scanned).cast("long"))
    )
