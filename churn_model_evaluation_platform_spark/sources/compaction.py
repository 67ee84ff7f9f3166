"""Small-file compaction — the maintenance job every file-dropped
ingestion store needs (the reference's drop-a-CSV-per-run flow,
churn_prediction_pipeline.py:642-680, produces exactly this: one small
file per pipeline run forever).

Thousands of tiny parquet files tax the driver (file listing, footer
reads, one scan task each); compaction rewrites them into files near a
target size so scans get well-sized splits and the listing stays O(GB),
not O(runs). Delta's OPTIMIZE does this with transaction support; this
is the plain-parquet form with a manifest instead of a log.

Scale notes:
- Bin-packing is driver-side over the FILE LISTING (name + byte size
  only) — never data. First-fit over name-sorted files keeps the
  assignment deterministic and roughly time-ordered.
- Each bin rewrites with one Spark job reading exactly its member
  files; bins are independent, so a scheduler can run them in
  parallel or resume after a failure by diffing the manifest.
- The rewrite preserves rows bit-for-bit (same schema, no re-sort);
  combine with functions/zorder.py:zorder_by first when the goal is
  clustering, not just file count.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CompactionBin:
    index: int
    files: list[str]
    total_bytes: int


def plan_compaction(
    src_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> list[CompactionBin]:
    """Deterministic first-fit bin-packing of ``src_dir``'s parquet
    files (name-sorted) into bins of ≤ ``target_bytes`` (a file larger
    than the target gets its own bin)."""
    entries = sorted(
        (e.name, e.stat().st_size)
        for e in os.scandir(src_dir)
        if e.is_file() and e.name.endswith(".parquet")
    )
    bins: list[CompactionBin] = []
    cur: list[str] = []
    cur_bytes = 0
    for name, size in entries:
        if cur and cur_bytes + size > target_bytes:
            bins.append(CompactionBin(len(bins), cur, cur_bytes))
            cur, cur_bytes = [], 0
        cur.append(os.path.join(src_dir, name))
        cur_bytes += size
    if cur:
        bins.append(CompactionBin(len(bins), cur, cur_bytes))
    return bins


def compact_small_files(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Rewrite ``src_dir``'s parquet files into ``dest_dir`` with one
    output file per bin. Returns the manifest DataFrame
    (bin, n_files, in_bytes) — callers persist it next to the data as
    the compaction record. Source files are left in place; swapping the
    directories (or deleting the originals) is the caller's
    transactional step, mirroring how OPTIMIZE commits."""
    bins = plan_compaction(src_dir, target_bytes)
    os.makedirs(dest_dir, exist_ok=True)
    for b in bins:
        (
            spark.read.parquet(*b.files)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(dest_dir, f"bin={b.index}"))
        )
    return spark.createDataFrame(
        [(b.index, len(b.files), b.total_bytes) for b in bins],
        "bin int, n_files int, in_bytes long",
    )
