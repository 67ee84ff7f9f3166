"""Projection / filter / validation / prep operators (SURVEY §2.B).

Reference parity:
- ``clean_column_names`` — churn_model_training.py:87-99
- ``validate_schema_containment`` — churn_prediction_pipeline.py:116-161
- ``feature_projection`` / casts / label pop — churn_model_training.py:62-84
- ``append_prediction_cols`` — churn_prediction_pipeline.py:233-235
- ``derive_output_key`` — churn_prediction_pipeline.py:238-246

All column *data* work is expressed as Catalyst column expressions (codegen,
pushdown-friendly); column *name* work is driver-side (names are metadata,
not data — renaming 14 headers on the driver is free at any scale).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import (
    NUMERICAL_COLUMNS,
    TARGET_COLUMN,
    TARGET_PREDICTION_COLUMN,
)


def clean_name(name: str) -> str:
    """lower → collapse runs of spaces → strip → spaces to underscores.

    Mirrors the reference's header normalization
    (churn_model_training.py:87-99) which turns e.g. ``"Call  Failure"``
    into ``call_failure``.
    """
    out = name.lower()
    out = re.sub(r"\s+", " ", out).strip()
    return out.replace(" ", "_")


def clean_column_names(df: DataFrame) -> DataFrame:
    """Normalize all column names. Pure metadata op — no job runs."""
    return df.toDF(*[clean_name(c) for c in df.columns])


@dataclass
class ValidationResult:
    ok: bool
    error: str | None = None
    missing_columns: list[str] = field(default_factory=list)


def validate_schema_containment(
    df: DataFrame | list[str], expected_columns: list[str], source_name: str = "<df>"
) -> ValidationResult:
    """Accept iff every expected column ⊆ df columns (compared in cleaned
    space, like the reference which cleans before checking —
    churn_prediction_pipeline.py:149-159). Extra columns are tolerated.

    Also accepts a raw column-name list — needed when a CSV is read
    through a DECLARED stream schema (the DataFrame then always has the
    declared columns, so the file's own header must be validated).
    """
    cols = df if isinstance(df, list) else df.columns
    have = {clean_name(c) for c in cols}
    missing = [c for c in expected_columns if clean_name(c) not in have]
    if missing:
        return ValidationResult(
            ok=False,
            error=(
                f"Input file {source_name} does not match expected structure. "
                f"Expected columns: {sorted(expected_columns)}"
            ),
            missing_columns=missing,
        )
    return ValidationResult(ok=True)


def validate_extension(path: str, ext: str = ".csv") -> ValidationResult:
    """Reject non-CSV keys (churn_prediction_pipeline.py:135-138)."""
    if not path.lower().endswith(ext):
        return ValidationResult(
            ok=False, error=f"Invalid file type for {path}. Expected a CSV file."
        )
    return ValidationResult(ok=True)


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str,
) -> DataFrame:
    """Deterministic exact stratified sample: per stratum, keep the first
    ``ceil(fraction * n)`` rows ordered by a portable content hash of the
    id — the same rows on every engine and every run (unlike
    ``sampleBy``, whose Bernoulli draw is per-partition RNG and neither
    exact nor engine-portable). The hash ordering is an unbiased
    pseudo-random permutation within each stratum.

    One window pass per stratum; at 100 TB the shuffle key is the
    stratum, and a hot stratum can be pre-split with the salting helper.
    """
    from ..functions.hashing import md5_hash_int

    h = md5_hash_int(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, id_col)
    cnt_w = Window.partitionBy(strata_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cnt_w))
        .where(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rn", "__n")
    )


def feature_projection(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Project the fixed feature list (churn_model_training.py:79).

    A plain ``select`` so Catalyst prunes the scan down to these columns
    (check ``ReadSchema`` in the explain output).
    """
    return df.select(*(columns or NUMERICAL_COLUMNS))


def cast_features_double(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Cast feature columns to double (churn_model_training.py:82)."""
    cols = columns or [c for c in df.columns]
    return df.select(
        *[
            F.col(c).cast("double").alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


def target_extract_cast(
    df: DataFrame, target: str = TARGET_COLUMN
) -> tuple[DataFrame, DataFrame]:
    """Split into (X without target, y as int) — churn_model_training.py:76-78.

    Unlike pandas' destructive ``pop`` we return two *plans* over the same
    source; Catalyst dedupes the scan. Raises if the target is absent.
    """
    if target not in df.columns:
        raise ValueError(f"Target column '{target}' not found in DataFrame")
    features = df.drop(target)
    label = df.select(F.col(target).cast("int").alias(target))
    return features, label


def prepare(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """clean names → project features (+ label if present) → cast doubles.

    The reference's ``prepare_data`` (churn_model_training.py:62-84) in one
    composable plan: keeps the int label column alongside the 11 double
    features (Spark-idiomatic single DataFrame instead of the (X, y) pair).
    """
    cols = columns or NUMERICAL_COLUMNS
    out = clean_column_names(df)
    keep = [F.col(c).cast("double").alias(c) for c in cols]
    if TARGET_COLUMN in out.columns:
        keep.append(F.col(TARGET_COLUMN).cast("int").alias(TARGET_COLUMN))
    return out.select(*keep)


def append_prediction_cols(
    df: DataFrame,
    actual,
    predicted,
) -> DataFrame:
    """Append ``churn`` (actual) + ``churn_prediction`` ints
    (churn_prediction_pipeline.py:233-235). ``actual``/``predicted`` are
    Column expressions evaluated against ``df``.
    """
    return df.withColumn(TARGET_COLUMN, actual.cast("int")).withColumn(
        TARGET_PREDICTION_COLUMN, predicted.cast("int")
    )


def proba_threshold(df: DataFrame, proba_col: str, threshold: float,
                    out_col: str = TARGET_PREDICTION_COLUMN) -> DataFrame:
    """Binarize a probability column at a tuned threshold
    (churn_model_training.py:266-269): ``(p >= t) as int``.
    """
    return df.withColumn(
        out_col,
        F.when(F.col(proba_col) >= F.lit(threshold), F.lit(1)).otherwise(F.lit(0)),
    )


def derive_output_key(
    input_key_col, model_name: str, model_version: str | int
):
    """Column expr composing the predictions filename from the input key +
    model identity (churn_prediction_pipeline.py:238-246):
    ``<stem>_predictions_<model>_v<version>.csv``.
    """
    stem = F.regexp_replace(
        F.element_at(F.split(input_key_col, "/"), -1), r"\.csv$", ""
    )
    return F.concat(
        stem, F.lit(f"_predictions_{model_name}_v{model_version}.csv")
    )


def weighted_sample_exact(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Data-mixing sampler: a DIFFERENT exact fraction per stratum (the
    per-source/per-language mixture weights of a training-data recipe).
    Same determinism contract as ``stratified_sample_exact``: per
    stratum, the first ceil(frac_s * n_s) rows in portable-hash order —
    identical row sets on every engine/run. Strata absent from
    ``fractions`` keep ``default_fraction``."""
    from ..functions.hashing import md5_hash_int

    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(
            F.col(strata_col) == F.lit(value), F.lit(float(f))
        ).otherwise(frac)
    h = md5_hash_int(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, id_col)
    cnt_w = Window.partitionBy(strata_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cnt_w))
        .where(F.col("__rn") <= F.ceil(F.col("__n") * frac))
        .drop("__rn", "__n")
    )


def impute_median(df: DataFrame, cols: list[str]) -> DataFrame:
    """Median imputation for null feature values — the training-prep
    step between validation and casting. ONE aggregation computes every
    column's exact interpolated median over its non-null values; the
    single-row result is broadcast and coalesced in — no per-column
    jobs, no second scan of the data."""
    med = df.agg(
        *[
            F.expr(f"percentile({c}, 0.5)").alias(f"__med_{c}")
            for c in cols
        ]
    )
    out = df.crossJoin(F.broadcast(med))
    return out.select(
        *[
            F.coalesce(F.col(c), F.col(f"__med_{c}")).alias(c)
            if c in cols
            else F.col(c)
            for c in df.columns
        ]
    )
