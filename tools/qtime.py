"""Isolated per-query timing: the bench's exact methodology (untimed
warm at sf0.001 for codegen + file-index, then best-of-N noop-sink runs
at the target SF) for a hand-picked query list, without the 60-query
rotation around it. Used by the optimization rounds to get clean
before/after numbers per target.

Usage::

    python tools/qtime.py [--sf DIR] [--runs N] query [query ...]

Prints one line per query: ``<name> best=<s> runs=[...]`` plus a final
JSON line {"name": best_sec, ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from churn_model_evaluation_platform_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="qtime")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    from churn_model_evaluation_platform_spark.plans import phases as _phases
    from churn_model_evaluation_platform_spark.sources.testdata import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()

    import gc

    out: dict[str, float] = {}
    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            continue
        fn = qs[name]
        # fresh-session conditions per query: unpersist leftover blocks
        # (a finished query's localCheckpoint RDDs — the measured
        # session-aging source, r16) and release leaked refs so the JVM
        # cleaner can drop prior queries' state (see bench.py)
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist(False)
        except Exception:
            pass
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        if not args.no_warm:
            try:
                spark.sparkContext.setJobDescription(f"warm:{name}")
                fn(spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception:
                pass
        times = []
        phases_best: dict = {}
        for i in range(args.runs):
            _phases.drain()
            spark.sparkContext.setJobDescription(f"time:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            ph = _phases.drain()
            if not times or dt < min(times):
                phases_best = ph
            times.append(round(dt, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = min(times)
        extra = ""
        if phases_best:
            build = sum(phases_best.values())
            extra = f" build={build:.2f} query={min(times) - build:.2f}"
        print(f"{name} best={min(times):.3f} runs={times}{extra}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
