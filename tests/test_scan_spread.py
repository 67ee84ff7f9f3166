"""Size-adaptive scan parallelism floor (optimization r15,
sources/testdata._spread_small_scan): small single-row-group files get
redistributed to the core count, tiny dimension files and
already-parallel scans do not, and content is never changed."""

from __future__ import annotations

import os

from churn_model_evaluation_platform_spark.sources.testdata import (
    _parse_bytes_conf,
    _spread_small_scan,
    load_table,
)


def test_parse_bytes_conf():
    assert _parse_bytes_conf("134217728b") == 128 << 20
    assert _parse_bytes_conf("128m") == 128 << 20
    assert _parse_bytes_conf("1g") == 1 << 30
    assert _parse_bytes_conf("4096") == 4096
    assert _parse_bytes_conf("garbage") == 128 << 20


def test_small_file_spreads_and_content_unchanged(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    df = spark.range(0, 5000).selectExpr("id", "id * 7 AS v")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    # the directory holds one part file; point at the single file so
    # getsize sees the real payload (mirrors the flat testdata layout)
    part = [
        f"{path}/{f}"
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ][0]
    base = spark.read.parquet(part)
    spread = _spread_small_scan(spark, base, part)
    if os.path.getsize(part) >= 256 << 10:
        raise AssertionError("fixture unexpectedly large")
    # under the 256 KB dim floor -> left alone
    assert spread is base


def test_spread_triggers_above_floor_and_preserves_rows(spark, tmp_path):
    import pyspark.sql.functions as F

    path = str(tmp_path / "big.parquet")
    # wide-row payload: six DISTINCT uuids/row (repeat() of one uuid
    # compresses to ~36 B) keeps compressed bytes/row well above the
    # _SPREAD_MIN_ROW_BYTES=64 payload threshold
    df = spark.range(0, 120_000).selectExpr(
        "id",
        "concat(uuid(), uuid(), uuid(), uuid(), uuid(), uuid()) AS payload",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    part = [
        f"{path}/{f}"
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ][0]
    assert os.path.getsize(part) >= 256 << 10
    base = spark.read.parquet(part)
    spread = _spread_small_scan(spark, base, part)
    cores = spark.sparkContext.defaultParallelism
    if cores > 2:
        assert spread.rdd.getNumPartitions() == cores
    assert spread.count() == 120_000
    assert spread.agg(F.sum("id")).collect()[0][0] == sum(range(120_000))


def test_load_table_results_unchanged(spark):
    # content equality spread vs raw read at sf0.1 (where the floor
    # actually triggers for documents)
    sf = "/root/testdata/sf0.1"
    if not os.path.isdir(sf):
        return
    raw = spark.read.parquet(f"{sf}/documents.parquet")
    via = load_table(spark, "documents", sf)
    assert via.count() == raw.count()
    assert (
        via.selectExpr("sum(crc32(cast(doc_id as string)))").collect()
        == raw.selectExpr("sum(crc32(cast(doc_id as string)))").collect()
    )
