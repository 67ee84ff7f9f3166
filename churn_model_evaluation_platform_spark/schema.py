"""Canonical schemas (SURVEY §1.3).

The reference declares no source schemas (pandas infers) but has two hard
contracts:

- the canonical 11-feature list ``NUMERICAL_COLUMNS`` (reference:
  code/orchestration/modeling/churn_model_training.py:38-52 — note
  ``tariff_plan`` and ``age`` are intentionally excluded), and
- the long-format metrics store ``drift_metrics(metric_name, value,
  created_at)`` (reference:
  code/orchestration/churn_prediction_pipeline.py:78-84).

We make both explicit ``StructType``s, plus the raw-CSV and predictions
schemas from FIXTURES.md F1/F3.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TARGET_COLUMN = "churn"
TARGET_PREDICTION_COLUMN = "churn_prediction"

# Canonical feature list, order matters (churn_model_training.py:38-52).
NUMERICAL_COLUMNS: list[str] = [
    "call_failure",
    "complains",
    "subscription_length",
    "charge_amount",
    "seconds_of_use",
    "frequency_of_use",
    "frequency_of_sms",
    "distinct_called_numbers",
    "age_group",
    "status",
    "customer_value",
]

# Columns present in the raw file but excluded from the feature matrix
# (churn_model_training.py:34-37,48-49).
EXCLUDED_COLUMNS: list[str] = ["tariff_plan", "age"]

# Raw churn CSV after clean_column_names (FIXTURES.md F1). All numerics are
# read wide (double) — the reference casts everything to float64 anyway
# (churn_model_training.py:82).
RAW_CHURN_SCHEMA = StructType(
    [StructField(c, DoubleType(), True) for c in NUMERICAL_COLUMNS[:9]]
    + [
        StructField("tariff_plan", IntegerType(), True),
        StructField("status", DoubleType(), True),
        StructField("age", IntegerType(), True),
        StructField("customer_value", DoubleType(), True),
        StructField(TARGET_COLUMN, IntegerType(), True),
    ]
)

# Feature matrix: 11 doubles (+ separate int label) — FIXTURES.md F2.
FEATURES_SCHEMA = StructType(
    [StructField(c, DoubleType(), False) for c in NUMERICAL_COLUMNS]
)

# Predictions table: features + churn int + churn_prediction int —
# FIXTURES.md F3 (churn_prediction_pipeline.py:233-235).
PREDICTIONS_SCHEMA = StructType(
    list(FEATURES_SCHEMA.fields)
    + [
        StructField(TARGET_COLUMN, IntegerType(), False),
        StructField(TARGET_PREDICTION_COLUMN, IntegerType(), False),
    ]
)

# Long-format metrics store — FIXTURES.md F4 (the ``id`` surrogate PK is a
# Postgres artifact; a distributed append-only table doesn't want a
# sequential key).
DRIFT_METRICS_SCHEMA = StructType(
    [
        StructField("metric_name", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("created_at", TimestampType(), False),
    ]
)
