"""Dump ``.explain("formatted")`` for named queries to files — the
plans/r15 deliverable helper.

Usage::

    python tools/dump_plan.py [--sf DIR] OUTDIR SUFFIX query [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` with the formatted physical
plan of the query's DataFrame at ``--sf`` (default sf0.001 — plan
shape, not data scale; building the frame may run fixture jobs for
streaming queries; size-adaptive plan features need the sf they
trigger at).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from churn_model_evaluation_platform_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    if args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    outdir, suffix, names = args[0], args[1], args[2:]
    spark = get_spark(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"{outdir}/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"{path}: {len(plan.splitlines())} lines", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
