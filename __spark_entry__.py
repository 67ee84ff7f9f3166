"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship monitoring pipeline (score → quality + drift →
long-format metrics) on sf0.001. ``queries``/``oracle_sql`` expose the
SURVEY §2 operator inventory from the package registry
(churn_model_evaluation_platform_spark/plans/registry*.py) for the DuckDB differential
check at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Importing registry_ext registers the extension entries into the same
# registry dicts as the core entries.
from churn_model_evaluation_platform_spark.plans import registry as _registry
from churn_model_evaluation_platform_spark.plans import registry_ext as _registry_ext  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext3 as _registry_ext3  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext4 as _registry_ext4  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext5 as _registry_ext5  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext6 as _registry_ext6  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext7 as _registry_ext7  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext8 as _registry_ext8  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext9 as _registry_ext9  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext10 as _registry_ext10  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext11 as _registry_ext11  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext12 as _registry_ext12  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext13 as _registry_ext13  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext14 as _registry_ext14  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext15 as _registry_ext15  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext16 as _registry_ext16  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext17 as _registry_ext17  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext18 as _registry_ext18  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext19 as _registry_ext19  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext20 as _registry_ext20  # noqa: F401
from churn_model_evaluation_platform_spark.plans import registry_ext21 as _registry_ext21  # noqa: F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one scored batch monitored end-to-end on sf0.001.

    events → synthetic scored batch (actual/predicted ints) → quality
    scores + per-column KS drift vs a reference slice → long metrics
    (metric_name, value, created_at). Mirrors the reference flow
    churn_prediction_pipeline.py:813-905 as one lazy Spark plan set.
    """
    # nanosAsLong must be set before reading the ns-timestamp parquet; the
    # driver owns the session, so set it here defensively.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from churn_model_evaluation_platform_spark.plans.pipeline import monitoring_run
    from churn_model_evaluation_platform_spark.sources.testdata import load_table

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, "events", sf_dir)
    scored = ev.select(
        "value",
        F.col("user_id").cast("double").alias("user_id"),
        (F.col("value") > 50).cast("int").alias("churn"),
        ((F.col("value") + F.col("user_id") % 7) > 50).cast("int").alias(
            "churn_prediction"
        ),
    )
    reference = ev.where(F.col("event_type") == "click").select(
        "value", F.col("user_id").cast("double").alias("user_id")
    )
    result = monitoring_run(
        current=scored,
        reference=reference,
        feature_cols=["value", "user_id"],
        alert_sink=lambda s, m: None,
    )
    return result.metrics


def _coverage_order(
    names: list[str], oracles: dict[str, str], artifacts_dir: str | None = None
) -> list[str]:
    """Order queries so the driver's bounded CORRECTNESS window cycles
    through the whole registry across rounds instead of re-checking the
    same prefix every time.

    Priority (registration order preserved within each tier):
      1. oracled queries whose latest driver row FAILED — an error OR a
         rows/schema/hash mismatch (prove the fix; a hash-red row left
         at recency tier would sort dead last and never be re-proven,
         the r6 rotation bug),
      2. oracled queries never checked by any prior round,
      3. oracled queries already green, least-recently-checked first,
      4. no-oracle (rows-only) queries dead last — they can only ever
         produce weaker rows-only rows, so they shouldn't occupy window
         slots ahead of hash-checkable entries.
    Names present in old artifacts but absent from the current registry
    (renames, e.g. stratified_kfold_hash → kfold_hash in r5) are
    skipped when building the tiers. Reads the driver's own
    CORRECTNESS_r*.json artifacts; with none present the order degrades
    to plain registration order.
    """
    import glob as _glob
    import json as _json
    import os as _os

    here = artifacts_dir or _os.path.dirname(_os.path.abspath(__file__))
    live = set(names)
    last_round: dict[str, int] = {}
    last_bad: dict[str, bool] = {}
    paths = sorted(_glob.glob(_os.path.join(here, "CORRECTNESS_r*.json")))
    for rnd, path in enumerate(paths, 1):
        # rnd is the file's position in round order — strictly increasing
        # per file, so recency tiers never tie even when a round re-checks
        # only already-seen names.
        try:
            rows = _json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if name not in live:
                continue  # tombstone from a renamed/removed query
            last_round[name] = max(last_round.get(name, 0), rnd)
            # Latest file wins (paths are sorted): a row is bad if it
            # errored or any match flag is explicitly False. `is False`
            # so a null/absent hash_match (rows-only row) isn't "bad".
            last_bad[name] = bool(row.get("err")) or any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )

    def tier(name: str) -> tuple:
        if name not in oracles:
            return (3, 0)
        if last_bad.get(name):
            return (0, 0)
        if name not in last_round:
            return (1, 0)
        return (2, last_round[name])

    return sorted(names, key=lambda n: (tier(n), names.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ north-star
    extensions). Each callable takes (spark, sf_dir) → DataFrame with
    column names matching the oracle exactly. Ordered so the driver's
    bounded correctness window rotates through all registered queries
    across rounds (see _coverage_order)."""
    qs = _registry.queries()
    order = _coverage_order(list(qs), _registry.oracle_sql())
    return {name: qs[name] for name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for nondeterministic /
    streaming-stateful ops → rows-only check)."""
    return _registry.oracle_sql()
