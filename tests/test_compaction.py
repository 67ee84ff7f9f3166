"""Small-file compaction: deterministic bin-packing plan + row-exact
rewrite (sources/compaction.py)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.compaction import (
    compact_small_files,
    plan_compaction,
)


def _write_chunks(spark, src, n_chunks=6, rows_per=200):
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    for i in range(n_chunks):
        pdf = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        pdf.toPandas().to_parquet(os.path.join(src, f"chunk_{i:03d}.parquet"))


def test_plan_is_deterministic_and_respects_target(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_chunks(spark, src)
    sizes = {
        e.name: e.stat().st_size for e in os.scandir(src) if e.is_file()
    }
    one = min(sizes.values())
    plan = plan_compaction(src, target_bytes=one * 2 + 100)
    assert plan == plan_compaction(src, target_bytes=one * 2 + 100)
    assert all(len(b.files) <= 3 for b in plan)
    assert sum(len(b.files) for b in plan) == 6
    # oversized file still gets a bin
    tiny = plan_compaction(src, target_bytes=1)
    assert all(len(b.files) == 1 for b in tiny)


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _write_chunks(spark, src)
    sizes = [e.stat().st_size for e in os.scandir(src) if e.is_file()]
    manifest = compact_small_files(
        spark, src, dest, target_bytes=sum(sizes) // 2 + max(sizes)
    )
    bins = manifest.collect()
    assert 1 < len(bins) < 6
    before = spark.read.parquet(src)
    after = spark.read.parquet(dest).drop("bin")
    assert after.count() == before.count() == 1200
    assert after.exceptAll(before).count() == 0
    n_out_files = sum(
        1
        for root, _, files in os.walk(dest)
        for f in files
        if f.endswith(".parquet")
    )
    assert n_out_files == len(bins)
