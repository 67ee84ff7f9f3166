"""EDA operators on hand-computable frames."""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.operators.eda import (
    describe_stats,
    duplicate_row_count,
    grouped_describe,
    histogram_bins,
    null_count_per_column,
)


def test_describe_stats_quartiles(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], ["x"])
    r = describe_stats(df, ["x"]).first()
    assert r["count"] == 4.0
    assert r["mean"] == 2.5
    assert r["q1"] == 1.75  # exact linear interpolation, pandas-style
    assert r["median"] == 2.5
    assert r["q3"] == 3.25
    assert r["std"] == pytest.approx(1.2909944487, abs=1e-9)


def test_null_counts(spark):
    df = spark.createDataFrame(
        [(1.0, None), (None, None)], "a double, b double"
    )
    out = {r["column"]: r["null_count"] for r in null_count_per_column(df).collect()}
    assert out == {"a": 1, "b": 2}


def test_duplicate_row_count(spark):
    df = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], ["a", "b"])
    assert duplicate_row_count(df).first()["duplicate_rows"] == 1


def test_grouped_describe(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (0, 3.0), (1, 10.0)], ["churn", "v"]
    )
    rows = {r["churn"]: r for r in grouped_describe(df, "churn", "v").collect()}
    assert rows[0]["mean"] == 2.0 and rows[0]["count"] == 2
    assert rows[1]["max"] == 10.0


def test_histogram_bins(spark):
    df = spark.createDataFrame([(1.0,), (9.0,), (11.0,), (25.0,)], ["v"])
    out = {r["bin"]: r["bin_count"] for r in histogram_bins(df, "v", 10.0).collect()}
    assert out == {0: 2, 1: 1, 2: 1}


def test_corr_matrix_known_values(spark):
    from churn_model_evaluation_platform_spark.operators.eda import corr_matrix

    rows = [(float(i), float(2 * i), float(-i), 1.0 if i % 2 else 2.0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, ["a", "b", "c", "d"])
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()
    }
    assert got[("a", "b")] == pytest.approx(1.0)   # perfectly linear
    assert got[("a", "c")] == pytest.approx(-1.0)  # perfectly anti-linear
    assert abs(got[("a", "d")]) < 0.3              # alternating, ~uncorrelated
    assert len(got) == 6                           # upper triangle only
