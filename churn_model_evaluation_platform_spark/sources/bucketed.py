"""Bucketed-table layout for co-located joins (the 100 TB join story).

A fact-to-fact equi-join normally shuffles BOTH sides on the key every
time it runs. Writing the tables bucketed (hash-clustered + sorted) on
the join key moves that shuffle to WRITE time, once: every subsequent
join of tables bucketed the same way compiles to a sort-merge join with
NO Exchange on either side (tests/test_bucketed.py asserts exactly
that on the physical plan).

Spark's bucketing rides the table catalog, so these helpers register
external tables (data lives at ``path``, metadata in the session
catalog). Use the same ``n_buckets`` on both sides — mismatched bucket
counts fall back to shuffling one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
) -> None:
    """Write ``df`` as an external parquet table hash-bucketed and
    sorted by ``bucket_col`` — pays the clustering shuffle once so every
    later join/aggregation on that key is exchange-free."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (the bucket spec only
    survives the catalog path — ``spark.read.parquet`` on the files
    would lose it and reintroduce the shuffle)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


__all__ = ["drop_bucketed", "read_bucketed", "write_bucketed"]
