"""Loaders for the driver-generated TPC-H-ish parquet tables
(/root/testdata/sf*/; see TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable on Python WORKERS regardless of the
    driver's cwd/sys.path: module-level functions crossing the worker
    boundary (pandas UDFs, applyInPandasWithState) are cloudpickled BY
    REFERENCE, so workers must import the module. A driver that added
    /root/repo to sys.path at runtime doesn't propagate that to workers
    — ship a zip of the package via addPyFile once per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, "_churnspark_shipped", False):
        return
    import os
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(
        tempfile.gettempdir(), f"churnspark_pkg_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        base, "zip", root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    sc.addPyFile(zip_path)
    sc._churnspark_shipped = True


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    # The driver owns the session; events.parquet carries TIMESTAMP(NANOS)
    # which Spark rejects unless this runtime SQL conf is set.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Every registry query flows through here — central hook to make the
    # package importable on Python workers (see ensure_package_shipped).
    ensure_package_shipped(spark)
    df = spark.read.parquet(f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to session-tz TIMESTAMP
    regardless of the parquet physical type the generator emitted.
    Used by both batch `load_table` and the streaming readers (which
    bypass load_table)."""
    ts_type = df.schema[col].dataType
    if isinstance(ts_type, LongType):
        # TIMESTAMP(NANOS) read as long (see session.py). Integer DIV —
        # double division would lose precision at epoch-nanos magnitude.
        # DuckDB's native TIMESTAMP is µs too, so oracle comparisons agree.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        # parquet timestamp[us] (no tz) arrives as TIMESTAMP_NTZ, which
        # unix_micros and streaming event-time reject. The session runs
        # in UTC, so the cast is a pure re-tag — wall-clock values (and
        # DuckDB-µs oracle parity) are unchanged.
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so `spark.sql` queries mirror
    the driver's DuckDB oracle environment."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
