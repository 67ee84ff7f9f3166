"""SparkSession factory.

One place to set the scale-oriented defaults: AQE on (runtime re-planning,
skew-join handling, coalescing post-shuffle partitions), Arrow for any
pandas-UDF boundary, and a shuffle-partition count appropriate for the
local test harness (on a real cluster this is overridden by config or AQE
coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "churn_model_evaluation_platform_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults are tuned so the same code runs on ``local[N]`` for tests and
    unchanged on a multi-executor cluster:

    - ``spark.sql.adaptive.enabled``: runtime plan changes (partition
      coalescing, skew-join splitting, broadcast conversion) — essential at
      100 TB where static estimates are wrong.
    - ``spark.sql.execution.arrow.pyspark.enabled``: Arrow batches for the
      few pandas-UDF paths (model scoring), ~10-100x over row-at-a-time.
    - shuffle partitions sized to the local core count; AQE coalesces
      further when partitions are small.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd: ~30% smaller parquet than snappy at similar scan speed —
        # at 100 TB the storage/IO saving dominates the encode cost.
        # (Runtime bloom-filter join pruning + parquet filter pushdown
        # are already on by default in this Spark version.)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        # Testdata events.parquet carries TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type — read as long, converted in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Python DataSource filter pushdown (4.1): lets format("txnlog")
        # translate Catalyst's pushed predicates into commit-log file
        # pruning (sources/txnlog_datasource.py). Runtime-settable; also
        # set defensively by register_txnlog_source for foreign sessions.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # ContextCleaner only reclaims RDD blocks / broadcasts /
        # shuffle state after a DRIVER GC collects their references,
        # and the default periodic-GC interval is 30 MINUTES — a
        # long-lived session that materializes many frames
        # (localCheckpoint-heavy iterative operators, streaming
        # fixtures) accretes heap until queries run 2-5× slower
        # (measured: the r15 baseline sweep's late queries —
        # gopher_repetition 22.0 s aged vs 4.0 s fresh, 5-gram LM
        # 14.4 s vs 5.9 s). Two minutes keeps cleanup bounded at any
        # session length; on a real cluster the same setting just
        # bounds executor block accretion. (optimization r15)
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
