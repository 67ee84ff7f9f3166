"""Round-6 batch-4 semantics: sequential (streaming) CDC vs latest-only
MERGE divergence, proper scoring rules, embedding outlier gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.cdc import cdc_apply
from churn_model_evaluation_platform_spark.operators.similarity import (
    embedding_outliers,
)


def test_sequential_cdc_differs_from_latest_only_on_interleaved_delete(spark):
    """The semantic the stream_cdc_upsert oracle encodes: applying
    batches in order, an intermediate delete destroys the snapshot row
    (and its snapshot-only columns) even when a later batch re-inserts
    the key — latest-only MERGE would have kept the segment."""
    snap = spark.createDataFrame([(1, 10.0, "seg")], "k int, bal double, tag string")
    b1 = spark.createDataFrame([(1, "D", 1, None)], "k int, op string, seq int, bal double")
    b2 = spark.createDataFrame([(1, "U", 2, 99.0)], "k int, op string, seq int, bal double")
    seq = cdc_apply(cdc_apply(snap, b1, ["k"], ["seq"]), b2, ["k"], ["seq"])
    latest = cdc_apply(snap, b1.unionByName(b2), ["k"], ["seq"])
    r_seq = seq.collect()[0]
    r_latest = latest.collect()[0]
    assert r_seq.bal == 99.0 and r_seq.tag is None  # re-insert, tag lost
    assert r_latest.bal == 99.0 and r_latest.tag == "seg"  # tag kept


def test_proper_scoring_perfect_and_uninformative(spark):
    from churn_model_evaluation_platform_spark.plans.registry_ext8 import (
        q_proper_scoring,  # noqa: F401  (import proves registration)
    )

    def scores(rows):
        df = spark.createDataFrame(rows, "churn int, proba double")
        churn_d = F.col("churn").cast("double")
        ll = -(
            churn_d * F.log(F.greatest(F.col("proba"), F.lit(1e-15)))
            + (1 - churn_d)
            * F.log(F.greatest(1 - F.col("proba"), F.lit(1e-15)))
        )
        return df.agg(
            F.avg(F.pow(F.col("proba") - churn_d, 2)).alias("brier"),
            F.avg(ll).alias("log_loss"),
        ).collect()[0]

    perfect = scores([(1, 1.0), (0, 0.0)])
    assert perfect.brier == 0.0
    assert perfect.log_loss < 1e-10
    coin = scores([(1, 0.5), (0, 0.5)])
    assert abs(coin.brier - 0.25) < 1e-12
    assert abs(coin.log_loss - math.log(2)) < 1e-12


def test_embedding_outliers_finds_planted_outlier(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(8)]) for i in range(100)]
    rows.append((999, [25.0] * 8))  # planted far outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = embedding_outliers(df, k=3).collect()
    assert top[0].vec_id == 999
    assert top[0].score > top[1].score * 2
