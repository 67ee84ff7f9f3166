"""Binned drift family (PSI / Jensen–Shannon / chi-squared): known-value
pins and invariances."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.drift import (
    chi2_drift,
    js_divergence,
    psi,
)


@pytest.fixture(scope="module")
def shifted(spark):
    rng = random.Random(21)
    a = spark.createDataFrame(
        [(rng.gauss(0, 1),) for _ in range(2000)], "value double"
    )
    b = spark.createDataFrame(
        [(rng.gauss(3, 1),) for _ in range(2000)], "value double"
    )
    return a, b


def test_identical_samples_scores_zeroish(spark, shifted):
    a, _ = shifted
    assert psi(a, a, "value", 0.5).first()["psi"] == pytest.approx(0.0, abs=1e-12)
    assert js_divergence(a, a, "value", 0.5).first()["js"] == pytest.approx(
        0.0, abs=1e-12
    )
    row = chi2_drift(a, a, "value", 0.5).first()
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert row["p_approx"] > 0.99


def test_shifted_samples_score_high(spark, shifted):
    a, b = shifted
    assert psi(a, b, "value", 0.5).first()["psi"] > 0.25  # "shifted" band
    js = js_divergence(a, b, "value", 0.5).first()["js"]
    assert 0.0 < js <= math.log(2) + 1e-9
    row = chi2_drift(a, b, "value", 0.5).first()
    assert row["chi2"] > row["dof"] * 10
    assert row["p_approx"] < 1e-6


def test_js_symmetric(spark, shifted):
    a, b = shifted
    ab = js_divergence(a, b, "value", 0.5).first()["js"]
    ba = js_divergence(b, a, "value", 0.5).first()["js"]
    assert ab == pytest.approx(ba, abs=1e-12)


def test_wasserstein_known_shift(spark):
    # W1 between X and X+c is exactly |c|.
    from churn_model_evaluation_platform_spark.operators.drift import wasserstein

    rng = random.Random(8)
    vals = [rng.uniform(0, 10) for _ in range(500)]
    a = spark.createDataFrame([(v,) for v in vals], "value double")
    b = spark.createDataFrame([(v + 2.5,) for v in vals], "value double")
    w = wasserstein(a, b, "value").first()["wasserstein"]
    assert w == pytest.approx(2.5, abs=1e-9)
    assert wasserstein(a, a, "value").first()["wasserstein"] == pytest.approx(
        0.0, abs=1e-12
    )


def test_chi2_pvalue_against_known_value(spark):
    # chi2=3.84 at dof=1 → p ≈ 0.05 (the classic cutoff); Wilson–Hilferty
    # + A&S erf is good to ~1e-3 here.
    one = spark.range(1)
    from churn_model_evaluation_platform_spark.operators.drift import _norm_cdf_expr

    z = (
        (F.lit((3.84 / 1.0) ** (1.0 / 3.0)) - F.lit(1 - 2.0 / 9.0))
        / F.lit(math.sqrt(2.0 / 9.0))
    )
    p = 1.0 - one.select(_norm_cdf_expr(z).alias("c")).first()["c"]
    assert p == pytest.approx(0.05, abs=0.005)


def test_drift_statistic_dispatch(spark, shifted):
    from churn_model_evaluation_platform_spark.operators.drift import drift_statistic

    a, b = shifted
    assert drift_statistic(a, b, "value").columns == [
        "ks_stat", "p_value", "n_ref", "n_cur",
    ]
    assert drift_statistic(a, b, "value", "wasserstein").columns == ["wasserstein"]
    assert drift_statistic(a, b, "value", "psi", 0.5).columns == ["psi"]
    assert drift_statistic(a, b, "value", "js", 0.5).columns == ["js"]
    assert drift_statistic(a, b, "value", "chi2", 0.5).columns == [
        "chi2", "dof", "p_approx",
    ]
    with pytest.raises(ValueError):
        drift_statistic(a, b, "value", "nope")


def test_auto_method_switch_point(spark):
    # Evidently's numerical-preset rule (VERDICT r7 #6): KS while the
    # reference column has <= 1000 non-null rows, Wasserstein above.
    # Pin the exact boundary: 1000 -> ks, 1001 -> wasserstein.
    from churn_model_evaluation_platform_spark.operators.drift import (
        drift_statistic,
        ks_2samp,
        wasserstein,
    )

    cur = spark.range(500).select((F.col("id") * 2.0).alias("value"))

    ref_at = spark.range(1000).select(F.col("id").cast("double").alias("value"))
    at = drift_statistic(ref_at, cur, "value", method="auto").first()
    assert at["method"] == "ks"
    expected_ks = ks_2samp(ref_at, cur, "value").first()["ks_stat"]
    assert at["drift_score"] == round(expected_ks, 6)

    ref_over = spark.range(1001).select(F.col("id").cast("double").alias("value"))
    over = drift_statistic(ref_over, cur, "value", method="auto").first()
    assert over["method"] == "wasserstein"
    expected_wd = wasserstein(ref_over, cur, "value").first()["wasserstein"]
    assert over["drift_score"] == round(expected_wd, 6)

    # Null reference values don't count toward the threshold.
    ref_nulls = ref_over.select(
        F.when(F.col("value") < 1.0, None).otherwise(F.col("value")).alias("value")
    )
    assert (
        drift_statistic(ref_nulls, cur, "value", method="auto").first()["method"]
        == "ks"
    )
