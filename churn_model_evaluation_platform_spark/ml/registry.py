"""Model registry + reference-artifact lifecycle (SURVEY §2.A
``registry_model_source`` / ``artifact_reference_source``; §2.C
``model_promote_alias``).

Two layers:

- **Reference snapshots** (testable everywhere): the drift baseline the
  reference attaches to each model version as a CSV artifact
  (churn_model_training.py:180-188, reloaded
  churn_prediction_pipeline.py:276-297) becomes a versioned Parquet
  snapshot — columnar, splittable, schema-carrying. The snapshot is
  broadcast-sized by construction (one training batch).

- **MLflow registry** (gated import — not installed in the minimal test
  container): model log/alias/load by ``models:/<name>@<alias>`` URI,
  mirroring fetch_model churn_prediction_pipeline.py:87-113 and the
  alias promotion churn_model_training.py:192-194.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SNAPSHOT_BASE = "reference_snapshots"


def write_reference_snapshot(
    df: DataFrame, base_dir: str, model_name: str, version: int
) -> str:
    """Persist the drift-reference table for one model version
    (the Spark-native form of the reference_data.csv artifact)."""
    path = f"{base_dir}/{SNAPSHOT_BASE}/{model_name}/v{version}"
    df.write.mode("overwrite").parquet(path)
    return path


def read_reference_snapshot(
    spark: SparkSession, base_dir: str, model_name: str, version: int
) -> DataFrame:
    """Load the drift baseline attached to a model version
    (churn_prediction_pipeline.py:276-297)."""
    return spark.read.parquet(
        f"{base_dir}/{SNAPSHOT_BASE}/{model_name}/v{version}"
    )


def _require_mlflow():
    try:
        import mlflow  # noqa: PLC0415

        return mlflow
    except ImportError as e:  # pragma: no cover - depends on environment
        raise ImportError(
            "mlflow is not installed in this environment; the registry "
            "layer (models:/<name>@<alias> load, alias promotion) needs "
            "it. The engine's scoring path accepts any fitted MLlib "
            "model directly (operators/score.py) — mlflow is only the "
            "registry transport."
        ) from e


def fetch_model_udf(spark: SparkSession, name: str, alias: str):
    """Registry URI ``models:/<name>@<alias>`` → Arrow-vectorized scoring
    UDF (fetch_model churn_prediction_pipeline.py:87-113 + the
    model-as-UDF surface :196)."""
    mlflow = _require_mlflow()
    return mlflow.pyfunc.spark_udf(spark, f"models:/{name}@{alias}")


def promote_alias(name: str, version: int, alias: str = "staging") -> None:
    """Set the alias on a registered model version
    (churn_model_training.py:192-194)."""
    mlflow = _require_mlflow()
    mlflow.tracking.MlflowClient().set_registered_model_alias(
        name, alias, version
    )


__all__ = [
    "fetch_model_udf",
    "promote_alias",
    "read_reference_snapshot",
    "write_reference_snapshot",
]


# ---------------------------------------------------------------------------
# Local filesystem registry — the mlflow-less counterpart
# ---------------------------------------------------------------------------

import json


class LocalModelRegistry:
    """Filesystem model registry: register → alias → fetch, the
    engine-native counterpart of the reference's MLflow registry
    (fetch_model churn_prediction_pipeline.py:87-113; promotion
    churn_model_training.py:192-194) with no registry server.

    Layout under ``base_dir`` (any Hadoop-FS-reachable path — local,
    HDFS, S3A):

        models/<name>/v<N>/model/         MLlib writable (model.save)
        models/<name>/v<N>/calibrator/    optional (TrainedModel)
        models/<name>/v<N>/meta.json      model class + threshold + cols
        models/<name>/v<N>/reference/     optional drift-baseline parquet
        models/<name>/aliases/<alias>.json  {"version": N}

    Alias flips are small-file writes via the Hadoop FS (atomic enough
    for the single-writer promotion flow the reference runs; a real
    multi-writer deployment would put aliases behind a database, which
    ``append_metrics_jdbc``'s connection layer already reaches).
    """

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir.rstrip("/")

    # -- small-file IO over the Hadoop FS (portable to HDFS/S3A) --
    def _write_text(self, path: str, text: str) -> None:
        from ..sources.lifecycle import _fs_and_path

        fs, p = _fs_and_path(self.spark, path)
        out = fs.create(p, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def _read_text(self, path: str) -> str:
        # spark.read.text, not a raw FS stream: py4j copies byte-array
        # arguments, so Java-side reads into a Python bytearray are
        # silently lost; a one-file text scan is correct and portable.
        rows = self.spark.read.text(path).collect()
        return "\n".join(r["value"] for r in rows)

    def _exists(self, path: str) -> bool:
        from ..sources.lifecycle import _fs_and_path

        fs, p = _fs_and_path(self.spark, path)
        return fs.exists(p)

    def _model_dir(self, name: str, version: int) -> str:
        return f"{self.base}/models/{name}/v{version}"

    def next_version(self, name: str) -> int:
        v = 1
        while self._exists(f"{self._model_dir(name, v)}/meta.json"):
            v += 1
        return v

    def register(
        self,
        model,
        name: str,
        calibrator=None,
        threshold: float | None = None,
        feature_cols: list[str] | None = None,
        reference_df: DataFrame | None = None,
    ) -> int:
        """Persist a fitted MLlib model (or a TrainedModel's parts) as
        the next version; returns the version number."""
        version = self.next_version(name)
        d = self._model_dir(name, version)
        model.write().overwrite().save(f"{d}/model")
        meta = {
            "version": version,
            "model_class": f"{type(model).__module__}.{type(model).__name__}",
        }
        if calibrator is not None:
            calibrator.write().overwrite().save(f"{d}/calibrator")
            meta["calibrator_class"] = (
                f"{type(calibrator).__module__}.{type(calibrator).__name__}"
            )
        if threshold is not None:
            meta["threshold"] = float(threshold)
        if feature_cols is not None:
            meta["feature_cols"] = list(feature_cols)
        if reference_df is not None:
            reference_df.write.mode("overwrite").parquet(f"{d}/reference")
        self._write_text(f"{d}/meta.json", json.dumps(meta))
        return version

    def set_alias(self, name: str, alias: str, version: int) -> None:
        """Point an alias (staging/production) at a version — the
        reference's set_registered_model_alias."""
        self._write_text(
            f"{self.base}/models/{name}/aliases/{alias}.json",
            json.dumps({"version": int(version)}),
        )

    def resolve(self, name: str, alias: str) -> int:
        return int(
            json.loads(
                self._read_text(f"{self.base}/models/{name}/aliases/{alias}.json")
            )["version"]
        )

    def meta(self, name: str, version: int) -> dict:
        return json.loads(
            self._read_text(f"{self._model_dir(name, version)}/meta.json")
        )

    @staticmethod
    def _load_class(dotted: str):
        mod, cls = dotted.rsplit(".", 1)
        import importlib

        return getattr(importlib.import_module(mod), cls)

    def load(self, name: str, version: int | None = None, alias: str | None = None):
        """Load (model, calibrator_or_None, meta) by version or alias —
        the models:/<name>@<alias> fetch."""
        if version is None:
            if alias is None:
                raise ValueError("pass version= or alias=")
            version = self.resolve(name, alias)
        d = self._model_dir(name, version)
        meta = self.meta(name, version)
        model = self._load_class(meta["model_class"]).load(f"{d}/model")
        calibrator = None
        if "calibrator_class" in meta:
            calibrator = self._load_class(meta["calibrator_class"]).load(
                f"{d}/calibrator"
            )
        return model, calibrator, meta

    def load_reference(self, name: str, version: int) -> DataFrame:
        return self.spark.read.parquet(
            f"{self._model_dir(name, version)}/reference"
        )
