"""Local stand-in for the driver's DuckDB differential check.

Runs every queries() entry at the given sf dir, compares row count, sorted
column names, and order-insensitive rounded value multiset against
oracle_sql() via DuckDB. Usage:

    python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from churn_model_evaluation_platform_spark.session import get_spark  # noqa: E402
from churn_model_evaluation_platform_spark.sources.testdata import TABLES  # noqa: E402


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    # repr-wrap cells for the sort so None/mixed types are orderable; the
    # multiset equality is unaffected.
    keyed = sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(repr(c) for c in t),
    )
    return sorted_cols, keyed


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        sc, sk = frame_key(scols, srows)
        oc, ok_ = frame_key(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            n_fail += 1
        elif len(sk) != len(ok_):
            print(f"FAIL {name}: rowcount {len(sk)} vs {len(ok_)}")
            n_fail += 1
        elif sk != ok_:
            bad = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sk, ok_)) if a != b
            )
            print(f"FAIL {name}: values differ, first diff row {bad[0]}:")
            print(f"  spark : {bad[1]}")
            print(f"  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(
                f"PASS {name}: {len(sk)} rows, {len(sc)} cols "
                f"[{time.time()-t0:.1f}s]"
            )
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
