"""CSV source/sink with the reference's validation semantics
(SURVEY §2.A/§2.B).

``read_churn_csv`` = the reference's ``validate_file_input``
(churn_prediction_pipeline.py:116-161) re-expressed: extension check,
readable-CSV check, header normalization, containment validation — but the
data itself stays a lazy Spark plan (schema work needs only the header).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators.prep import (
    ValidationResult,
    clean_column_names,
    validate_extension,
    validate_schema_containment,
)


@dataclass
class ReadResult:
    ok: bool
    df: DataFrame | None
    error: str | None


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    infer: bool = True,
    escape: str = '"',
) -> DataFrame:
    """Header CSV scan (churn_prediction_pipeline.py:142-143). With an
    explicit schema Spark skips the inference pass — always pass one in
    production; inference reads the data twice.

    ``escape`` defaults to ``"`` (RFC 4180 doubled quotes — what pandas
    ``read_csv``/``to_csv`` and the reference's files use), NOT Spark's
    backslash default; pass ``\\`` for backslash-escaped inputs."""
    reader = spark.read.option("header", True).option("escape", escape)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_validated_csv(
    spark: SparkSession,
    path: str,
    expected_columns: list[str],
    schema=None,
) -> ReadResult:
    """Extension check → read → clean names → containment validation,
    with the reference's exact error-message contract (FIXTURES.md F5)."""
    ext = validate_extension(path)
    if not ext.ok:
        return ReadResult(False, None, ext.error)
    try:
        df = clean_column_names(read_csv(spark, path, schema=schema))
        # Force header/schema resolution so unreadable files fail here.
        _ = df.schema
    except Exception as e:  # noqa: BLE001 — mirror reference error wrapping
        return ReadResult(False, None, f"Error reading CSV file {path}: {e}")
    val: ValidationResult = validate_schema_containment(df, expected_columns, path)
    if not val.ok:
        return ReadResult(False, None, val.error)
    return ReadResult(True, df, None)


def write_csv(
    df: DataFrame, path: str, single_file: bool = False, escape: str = '"'
) -> None:
    """Headered CSV sink (churn_prediction_pipeline.py:250-251 —
    ``to_csv(index=False)``: header row, no index column, nulls as
    empty fields, RFC 4180 quoting).

    ``escape='"'`` makes quotes-in-fields come out DOUBLED
    (``"qu""ote"``), matching pandas/RFC 4180; Spark's out-of-the-box
    backslash escaping would produce files pandas misparses. Fields are
    quoted only when they contain the delimiter, a quote, or a newline
    — pandas ``QUOTE_MINIMAL`` parity. The emitted shape is pinned
    byte-level by the ``csv_sink`` oracle (plans/registry_ext11.py).

    ``single_file=True`` coalesces to one part — reference parity for
    small outputs; leave False at scale (multi-part parallel write)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).option(
        "escape", escape
    ).csv(path)
