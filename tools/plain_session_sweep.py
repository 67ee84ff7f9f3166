"""Driver-parity sweep: run every queries() entry on a PLAIN
SparkSession (none of session.get_spark's conveniences) at sf0.001 —
the environment the driver's correctness harness actually uses. Catches
session-conf dependencies (e.g. nanosAsLong for the ns-timestamp
parquet) that diffcheck's configured session would mask.

Usage: python tools/plain_session_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    # entry() first — the driver smoke does the same.
    n = len(entrymod.entry(spark).collect())
    print(f"entry: {n} rows")
    qs = entrymod.queries()
    failed = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t = time.time()
        try:
            cnt = fn(spark, sf_dir).count()
            print(f"ok   {name}: {cnt} rows [{time.time() - t:.1f}s]")
        except Exception as exc:  # noqa: BLE001 — report every failure
            failed.append(name)
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:200]}")
    print(f"\n{n_run - len(failed)} ok, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
