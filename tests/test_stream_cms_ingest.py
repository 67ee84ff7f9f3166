"""Streaming CMS maintenance through the txn table (round 12): the
ADDITIVE-merge contrast to the HLL stream. Pins the property the
claimed batch ids exist for: a REPLAYED epoch (same batch_id) is a
no-op and the merged estimate stays exact-on-this-fixture, while a
genuine double delivery (fresh batch_id) demonstrably CORRUPTS the
additive sketch — which is why CMS partials must ride exactly-once
commits while HLL/KMV partials tolerate at-least-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.sketch import (
    cms_counters,
    cms_estimate,
    cms_merge,
)
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _est(spark, table, probes):
    counters = cms_merge(table.scan().select("j", "bucket", "c"))
    return {
        r["probe"]: r["cms_estimate"]
        for r in cms_estimate(counters, probes).collect()
    }


def test_replay_noop_but_double_delivery_corrupts(spark, tmp_path):
    df = spark.createDataFrame(
        [(v % 10,) for v in range(500)], "user_id long"
    )
    probes = spark.createDataFrame([(v,) for v in range(10)], "probe long")
    table = TxnTable(spark, f"{tmp_path}/counters")
    part = cms_counters(df, "user_id")
    table.append(part, batch_id=0)
    v = table.latest_version()
    base = _est(spark, table, probes)
    assert all(base[k] >= 50 for k in range(10))

    # replayed epoch: claimed batch id — no commit, estimates unchanged
    table.append(part, batch_id=0)
    assert table.latest_version() == v
    assert _est(spark, table, probes) == base

    # genuine double delivery under a FRESH batch id: the additive
    # merge double-counts — the corruption exactly-once prevents
    table.append(part, batch_id=1)
    doubled = _est(spark, table, probes)
    assert all(doubled[k] == 2 * base[k] for k in range(10))
