from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="churn_model_evaluation_platform_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture
def churn_rows():
    """FIXTURES.md F5: 4-row churn-shaped frame, every feature [1,2,3,4],
    churn [0,1,0,1]."""
    from churn_model_evaluation_platform_spark.schema import NUMERICAL_COLUMNS

    cols = NUMERICAL_COLUMNS + ["churn"]
    rows = [tuple(float(i + 1) for _ in NUMERICAL_COLUMNS) + (i % 2,) for i in range(4)]
    return cols, rows


@pytest.fixture
def churn_df(spark, churn_rows):
    cols, rows = churn_rows
    return spark.createDataFrame(rows, cols)
