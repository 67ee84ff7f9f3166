"""Bucketed co-located join: the physical plan must contain NO Exchange
(the clustering shuffle was paid at write time), and results must equal
the plain join."""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.sources.bucketed import (
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    a = spark.createDataFrame(
        [(i % 50, i) for i in range(2000)], "k int, va int"
    )
    b = spark.createDataFrame(
        [(i % 50, -i) for i in range(1000)], "k int, vb int"
    )
    write_bucketed(a, "t_buck_a", str(tmp_path / "a"), "k", 8)
    write_bucketed(b, "t_buck_b", str(tmp_path / "b"), "k", 8)
    yield a, b
    drop_bucketed(spark, "t_buck_a")
    drop_bucketed(spark, "t_buck_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    # force the sort-merge path (broadcast would hide the bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "t_buck_a").join(
            read_bucketed(spark, "t_buck_b"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: zero shuffle
        # same result as the plain (shuffling) join
        want = a.join(b, "k").count()
        assert joined.count() == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    # control: the same join off raw DataFrames shuffles both sides
    a, b = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
