"""Evidence for the z-order claim in SCALE.md: after `zorder_by`, the
per-file (row-group) min/max envelopes let a 2-D predicate skip most
files — and beat a single-column sort layout on the OTHER dimension.

Uses pyarrow to read each output file's column statistics (exactly the
footer stats a parquet reader prunes with) and counts files whose
envelope intersects a box predicate."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.functions.zorder import zorder_by


def _files_intersecting(dirpath: str, x_rng, y_rng) -> tuple[int, int]:
    files = sorted(glob.glob(os.path.join(dirpath, "part-*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if name == "x":
                    xmin, xmax = min(xmin, st.min), max(xmax, st.max)
                elif name == "y":
                    ymin, ymax = min(ymin, st.min), max(ymax, st.max)
        if xmin <= x_rng[1] and xmax >= x_rng[0] and ymin <= y_rng[1] and ymax >= y_rng[0]:
            hit += 1
    return hit, len(files)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    n = 64
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    z_dir = str(tmp_path / "zorder")
    x_dir = str(tmp_path / "xsort")
    zorder_by(df, "x", "y", num_partitions=16).write.parquet(z_dir)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(x_dir)
    )
    # A small box in the middle of the domain (both dims selective).
    box = ((24, 31), (24, 31))
    z_hit, z_total = _files_intersecting(z_dir, *box)
    x_hit, x_total = _files_intersecting(x_dir, *box)
    assert z_total == x_total == 16
    # Z-order: only the tiles overlapping the box match (<= 4 of 16).
    assert z_hit <= 4, z_hit
    # A y-only predicate: the x-sorted layout can prune NOTHING (every
    # file spans all y), while z-order still skips at least half.
    y_band = ((0, n - 1), (0, 7))
    zb_hit, _ = _files_intersecting(z_dir, *y_band)
    xb_hit, _ = _files_intersecting(x_dir, *y_band)
    assert xb_hit == 16
    assert zb_hit <= 8, zb_hit
