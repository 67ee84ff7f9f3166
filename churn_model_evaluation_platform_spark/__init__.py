"""churn_model_evaluation_platform_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference churn
model-evaluation platform (paultongyoo/churn-model-evaluation-platform).

Architecture (Spark-first, not a port):

- Every operator is a function ``DataFrame -> DataFrame`` (lazily planned,
  composable; Catalyst optimizes the fused plan).
- The monitoring IR is the long-format ``drift_metrics`` table
  ``(metric_name string, value double, created_at timestamp)`` exactly as
  the reference's Postgres store (reference:
  code/orchestration/churn_prediction_pipeline.py:78-84).
- Drift statistics (two-sample KS) are native Spark aggregations
  (window ``cume_dist``-style ECDF + max-abs-diff), not a Python loop.
- Scoring is a pluggable model applied columnar-side; training is MLlib.
- Streaming ingestion is Structured Streaming ``readStream`` +
  ``foreachBatch`` replacing the reference's S3→Lambda→Prefect trigger.

Subpackages:
    operators/  relational + statistical operators (prep, quality, drift,
                metrics reshaping, EDA, dedup, similarity, text)
    sources/    readers/writers (CSV with validation, parquet, metrics sink)
    functions/  reusable column expressions (hashing, stats, text)
    plans/      end-to-end pipelines (batch scoring+monitoring run)
    streaming/  file-drop stream wrapper
    ml/         training-side dataflow (split, CV folds, GBT, calibration)
"""

__version__ = "0.1.0"
