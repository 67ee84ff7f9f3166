"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>}

Each query is forced end-to-end with the noop sink (full computation,
no result transfer, no output I/O) so Catalyst cannot prune the measured
work the way a bare count() would.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from churn_model_evaluation_platform_spark.session import get_spark  # noqa: E402

# Representative spread across operator families (SURVEY §2): quality agg,
# drift (windowed multi-column + scalable single-column KS), metric
# reshaping + store shapes, relational core, dedup, similarity, text.
HEADLINE = [
    "monitoring_metrics_full",
    "classification_scores",
    "per_label_scores",
    "value_drift",
    "value_drift_ks",
    "drifted_columns_count",
    "metrics_unpivot",
    "latest_per_metric",
    "metric_timeseries",
    "agg_groupby_multi",
    "agg_rollup",
    "join_agg_revenue",
    "join_semi_anti",
    "topk_per_group",
    "window_running_total",
    "asof_join",
    "interval_join",
    "sessionize",
    "value_drift_scalable",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk",
    "similarity_topk_lsh",
    "token_count",
    "text_quality",
    "describe_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark(app_name="churn_model_evaluation_platform_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warmup (not timed): JVM/codegen spin-up and one touch per table so
    # file-index listing + parquet footer reads don't land inside the
    # first query that happens to use each table.
    from churn_model_evaluation_platform_spark.sources.testdata import TABLES, load_table

    for t in TABLES:
        # noop write (not count): parquet count() is metadata-only and
        # would leave the first real page reads inside a timed query.
        load_table(spark, t, sf_dir).write.format("noop").mode("overwrite").save()

    # Warm every headline plan once at the smallest SF: identical
    # expression trees → Janino/whole-stage-codegen cache hits, so the
    # timed runs below measure execution, not first-compile (which
    # amortizes to zero in any long-lived deployment). Data volume at
    # sf0.001 is ~1% of the timed run — the warm pass is cheap.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass  # never let warmup kill the bench

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # one broken query must not blank the bench
            errors[name] = str(e).splitlines()[0][:200]

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
