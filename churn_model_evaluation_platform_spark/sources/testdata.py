"""Loaders for the driver-generated TPC-H-ish parquet tables
(/root/testdata/sf*/; see TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    # The driver owns the session; events.parquet carries TIMESTAMP(NANOS)
    # which Spark rejects unless this runtime SQL conf is set.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) read as long (see session.py). Integer DIV —
        # double division would lose precision at epoch-nanos magnitude.
        # DuckDB's native TIMESTAMP is µs too, so oracle comparisons agree.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so `spark.sql` queries mirror
    the driver's DuckDB oracle environment."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
