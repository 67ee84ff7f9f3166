"""hash_split / hash_folds: deterministic, layout-independent splits
(ml/training.py; reference churn_model_training.py:335-337, 254-257)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.ml.training import hash_folds, hash_split


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "row_id")


def test_split_partitions_every_row(spark, ids_df):
    train, test = hash_split(ids_df, "row_id", test_size=0.2)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 5000
    # 20% ± a few percent — md5 buckets are an unbiased draw.
    assert 0.15 < n_test / 5000 < 0.25
    # Disjoint sides.
    assert train.join(test, "row_id").count() == 0


def test_split_deterministic_across_repartition(spark, ids_df):
    _, test1 = hash_split(ids_df, "row_id", test_size=0.2)
    _, test2 = hash_split(ids_df.repartition(13), "row_id", test_size=0.2)
    a = {r.row_id for r in test1.collect()}
    b = {r.row_id for r in test2.collect()}
    assert a == b


def test_split_null_ids_not_dropped(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "row_id: bigint"
    )
    train, test = hash_split(df, "row_id", test_size=0.5)
    assert train.count() + test.count() == 3


def test_split_validates_test_size(ids_df):
    with pytest.raises(ValueError):
        hash_split(ids_df, "row_id", test_size=0.0)
    with pytest.raises(ValueError):
        hash_split(ids_df, "row_id", test_size=1.0)


def test_split_fine_quantization(spark, ids_df):
    # 0.375 is exactly representable over 10_000 buckets (cut=6250);
    # over 100 it would hit banker's-rounding ambiguity.
    train, test = hash_split(ids_df, "row_id", test_size=0.375)
    assert 0.34 < test.count() / 5000 < 0.41


def test_folds_cover_and_balance(spark, ids_df):
    folded = hash_folds(ids_df, "row_id", k=3)
    counts = {
        r.fold: r.n
        for r in folded.groupBy("fold").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {1, 2, 3}
    assert sum(counts.values()) == 5000
    for n in counts.values():
        assert 0.25 < n / 5000 < 0.42  # ~1/3 each


def test_folds_deterministic_across_repartition(spark, ids_df):
    f1 = {r.row_id: r.fold for r in hash_folds(ids_df, "row_id").collect()}
    f2 = {
        r.row_id: r.fold
        for r in hash_folds(ids_df.repartition(7), "row_id").collect()
    }
    assert f1 == f2


def test_folds_validates_k(ids_df):
    with pytest.raises(ValueError):
        hash_folds(ids_df, "row_id", k=1)
