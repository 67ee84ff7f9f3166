"""Prep/validation operators vs the reference's exact semantics
(churn_model_training.py:62-99; churn_prediction_pipeline.py:116-161;
error-message contract FIXTURES.md F5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.prep import (
    append_prediction_cols,
    clean_column_names,
    clean_name,
    derive_output_key,
    feature_projection,
    prepare,
    proba_threshold,
    target_extract_cast,
    validate_extension,
    validate_schema_containment,
)
from churn_model_evaluation_platform_spark.schema import NUMERICAL_COLUMNS


def test_clean_name_reference_cases():
    # raw headers from data/customer_churn_0.csv:1
    assert clean_name("Call  Failure") == "call_failure"
    assert clean_name("Subscription  Length") == "subscription_length"
    assert clean_name("Frequency of use") == "frequency_of_use"
    assert clean_name("  Charge  Amount ") == "charge_amount"
    assert clean_name("Churn") == "churn"


def test_clean_column_names(spark):
    df = spark.createDataFrame([(1, 2)], ["Call  Failure", "Age Group"])
    assert clean_column_names(df).columns == ["call_failure", "age_group"]


def test_validate_extension_error_message():
    r = validate_extension("data/input/test-file.asdfasdfadsf")
    assert not r.ok
    assert r.error == (
        "Invalid file type for data/input/test-file.asdfasdfadsf. "
        "Expected a CSV file."
    )
    assert validate_extension("data/input/x.csv").ok


def test_validate_containment(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    assert validate_schema_containment(df, ["a", "b"]).ok
    r = validate_schema_containment(df, ["a", "zz"], source_name="f.csv")
    assert not r.ok
    assert r.missing_columns == ["zz"]
    assert "does not match expected structure" in r.error
    # containment compares in CLEANED space (reference cleans first)
    messy = spark.createDataFrame([(1,)], ["Call  Failure"])
    assert validate_schema_containment(messy, ["call_failure"]).ok


def test_prepare_full(spark):
    # messy headers + extra + excluded columns; label kept as int
    data = [(1.0,) * 11 + (2, 33, 1)]
    cols = [c.replace("_", " ").title() for c in NUMERICAL_COLUMNS] + [
        "Tariff Plan",
        "Age",
        "Churn",
    ]
    df = spark.createDataFrame(data, cols)
    out = prepare(df)
    assert out.columns == NUMERICAL_COLUMNS + ["churn"]
    types = dict(out.dtypes)
    assert all(types[c] == "double" for c in NUMERICAL_COLUMNS)
    assert types["churn"] == "int"


def test_feature_projection_and_target(churn_df):
    proj = feature_projection(churn_df)
    assert proj.columns == NUMERICAL_COLUMNS
    x, y = target_extract_cast(churn_df)
    assert "churn" not in x.columns
    assert [r["churn"] for r in y.collect()] == [0, 1, 0, 1]


def test_proba_threshold(spark):
    df = spark.createDataFrame([(0.1,), (0.5,), (0.9,)], ["p"])
    out = proba_threshold(df, "p", 0.5)
    assert [r["churn_prediction"] for r in out.collect()] == [0, 1, 1]


def test_append_prediction_cols(spark):
    df = spark.createDataFrame([(10.0,), (90.0,)], ["v"])
    out = append_prediction_cols(df, F.col("v") > 50, F.col("v") > 20)
    rows = out.collect()
    assert [(r["churn"], r["churn_prediction"]) for r in rows] == [(0, 0), (1, 1)]


def test_derive_output_key(spark):
    # churn_prediction_pipeline.py:238-246 naming contract
    df = spark.createDataFrame([("data/input/batch_7.csv",)], ["key"])
    out = df.select(derive_output_key(F.col("key"), "XGBoostChurnModel", 4).alias("k"))
    assert out.first()["k"] == "batch_7_predictions_XGBoostChurnModel_v4.csv"


def test_stratified_sample_exact_counts_and_determinism(spark):
    from churn_model_evaluation_platform_spark.operators.prep import stratified_sample_exact

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(100)], "id long, s string"
    )
    out1 = stratified_sample_exact(df, "s", 0.2, "id")
    out2 = stratified_sample_exact(df, "s", 0.2, "id")
    rows1 = sorted(r["id"] for r in out1.collect())
    rows2 = sorted(r["id"] for r in out2.collect())
    assert rows1 == rows2  # run-to-run deterministic
    import math

    by_stratum = {
        r["s"]: r["cnt"]
        for r in out1.groupBy("s").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # strata sizes: a=66, b=34 → exact ceil(0.2 * n)
    assert by_stratum == {"a": math.ceil(66 * 0.2), "b": math.ceil(34 * 0.2)}


def test_weighted_sample_exact_mixture(spark):
    from churn_model_evaluation_platform_spark.operators.prep import (
        weighted_sample_exact,
    )

    rows = [(i, "en" if i < 100 else "de") for i in range(150)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = weighted_sample_exact(
        df, "lang", {"en": 0.5, "de": 0.2}, "doc_id"
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts == {"en": 50, "de": 10}  # exact ceil(frac * n) per stratum
    # deterministic: same rows on a second run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in weighted_sample_exact(
        df, "lang", {"en": 0.5, "de": 0.2}, "doc_id").collect())
    assert a == b
    # absent stratum default: fraction 0 drops it
    out2 = weighted_sample_exact(df, "lang", {"en": 0.1}, "doc_id")
    assert {r["lang"] for r in out2.collect()} == {"en"}


def test_impute_median_fills_only_nulls(spark):
    from churn_model_evaluation_platform_spark.operators.prep import impute_median

    rows = [(1, 10.0), (2, None), (3, 30.0), (4, 20.0), (5, None)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = {r["id"]: r["v"] for r in impute_median(df, ["v"]).collect()}
    assert got[1] == 10.0 and got[3] == 30.0 and got[4] == 20.0  # untouched
    assert got[2] == got[5] == 20.0  # median of {10, 20, 30}
