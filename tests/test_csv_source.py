"""CSV source with the reference's validation semantics — integration
tests against the local filesystem (replacing the reference's LocalStack
S3 tier, tests/integration/test_validate_file_input.py)."""

from __future__ import annotations

from churn_model_evaluation_platform_spark.schema import NUMERICAL_COLUMNS
from churn_model_evaluation_platform_spark.sources.csv_source import (
    read_validated_csv,
    write_csv,
)

EXPECTED = NUMERICAL_COLUMNS + ["churn"]


def _write_csv(path, header, rows):
    lines = [",".join(header)] + [",".join(str(v) for v in r) for r in rows]
    path.write_text("\n".join(lines))


def test_happy_path_messy_headers(spark, tmp_path):
    f = tmp_path / "batch.csv"
    raw_header = [c.replace("_", "  ").title() for c in NUMERICAL_COLUMNS] + ["Churn"]
    _write_csv(f, raw_header, [[i + 1] * 12 for i in range(4)])
    res = read_validated_csv(spark, str(f), EXPECTED)
    assert res.ok, res.error
    assert res.df.count() == 4
    assert set(EXPECTED) <= set(res.df.columns)


def test_invalid_extension(spark, tmp_path):
    f = tmp_path / "test-file.asdfasdfadsf"
    f.write_text("junk")
    res = read_validated_csv(spark, str(f), EXPECTED)
    assert not res.ok
    assert res.error == (
        f"Invalid file type for {f}. Expected a CSV file."
    )


def test_missing_columns(spark, tmp_path):
    f = tmp_path / "odd.csv"
    _write_csv(f, ["odd_col_1", "odd_col_2"], [[1, 2]])
    res = read_validated_csv(spark, str(f), EXPECTED)
    assert not res.ok
    assert "does not match expected structure" in res.error


def test_write_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1.0, 0), (2.0, 1)], ["v", "churn"])
    out = str(tmp_path / "out")
    write_csv(df, out, single_file=True)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert back.count() == 2
    assert set(back.columns) == {"v", "churn"}
