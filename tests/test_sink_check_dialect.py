"""Sink-side CHECK dialect parity (round 12, VERDICT r11 next #4):
the native sink evaluates CHECK constraints in embedded DuckDB while
the library evaluates them in Spark SQL. The matrix below (1) pins
VALUE PARITY for every construct the sink's allowlist admits, on edge
inputs, (2) demonstrates the real divergences the allowlist exists to
block (evaluable on both engines, different answers), and (3) pins the
sink's refusal of unproven constructs — a constraint the library would
refuse must never pass the sink."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable
from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
    register_txnlog_source,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_txnlog_source(spark)


# edge-value probe rows: negatives, zero, NULLs, boundary strings,
# fractional halves, dates
_PROBE_SQL = """
SELECT * FROM (VALUES
  (CAST(-7 AS BIGINT), CAST(3 AS BIGINT), CAST(2.5 AS DOUBLE), 'Hello',
   CAST('2024-02-29' AS DATE)),
  (CAST(0 AS BIGINT), CAST(-2 AS BIGINT), CAST(-2.5 AS DOUBLE), '',
   CAST('1999-12-31' AS DATE)),
  (CAST(9 AS BIGINT), CAST(NULL AS BIGINT), CAST(0.0 AS DOUBLE), NULL,
   CAST(NULL AS DATE)),
  (CAST(2147483647 AS BIGINT), CAST(1 AS BIGINT), CAST(1.5 AS DOUBLE),
   ' pad ', CAST('2024-01-01' AS DATE))
) AS t(a, b, d, s, dt)
"""

# every construct the sink's _CHECK_FUNC_ALLOW / operator surface
# admits, expressed as a CHECK-style boolean over the probe columns
_PARITY_EXPRS = [
    "a >= 0",
    "a + b < 100",
    "a - b <> 0",
    "a * 2 >= -100",
    "d / 2.0 < 10",
    "a % 3 IN (0, 1, -1)",  # negative modulo: both truncate toward 0
    "s LIKE 'H%'",
    "s LIKE '_ello'",
    "s IS NOT NULL",
    "b IS NULL OR b BETWEEN -5 AND 5",
    "CASE WHEN a > 0 THEN d >= 0 ELSE TRUE END",
    "coalesce(b, 0) >= -2",
    "nullif(a, 0) IS NULL OR a <> 0",
    "least(a, b) <= greatest(a, b)",
    "length(s) < 10",
    "lower(s) <> 'HELLO'",
    "upper(s) <> 'hello'",
    "trim(s) <> 'padx'",
    "ltrim(s) <> 'x'",
    "rtrim(s) <> 'x'",
    "abs(a) >= 0",
    "concat(s, 'x') <> 'zz'",
    "s || 'x' <> 'zz'",  # NULL || 'x' is NULL on both: row passes
    "CAST(dt AS STRING) <> '1970-01-01'",
    "CAST(a AS DOUBLE) < 1e18",
    "CAST(s AS STRING) <> 'nope'",
    "NOT (a < -100)",
]


def _duck_violations(expr: str) -> int:
    e = expr.replace("`", '"')
    return duckdb.sql(
        f"SELECT count(*) FROM ({_PROBE_SQL}) "
        f"WHERE NOT coalesce(({e}), TRUE)"
    ).fetchone()[0]


def _spark_violations(spark, expr: str) -> int:
    probe = spark.sql(_PROBE_SQL)
    return probe.where(~F.coalesce(F.expr(expr), F.lit(True))).count()


def test_allowlisted_constructs_have_value_parity(spark):
    for expr in _PARITY_EXPRS:
        assert _spark_violations(spark, expr) == _duck_violations(expr), expr


def test_allowlist_admits_every_parity_expr():
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        _TxnLogWriterBase,
    )

    w = _TxnLogWriterBase.__new__(_TxnLogWriterBase)
    for expr in _PARITY_EXPRS:
        w._refuse_unproven_dialect("c", expr)  # must not raise


# ---------------------------------------------------------------------------
# the divergences the allowlist blocks — evaluable on BOTH engines,
# different answers (the silent-wrong-accept direction)
# ---------------------------------------------------------------------------


def test_divergence_substring_index_zero_is_real(spark):
    s = spark.sql("SELECT substring('hello', 0, 3) AS x").collect()[0]["x"]
    d = duckdb.sql("SELECT substring('hello', 0, 3)").fetchone()[0]
    assert s == "hel" and d == "he" and s != d


def test_divergence_cast_fractional_to_int_is_real(spark):
    s = spark.sql("SELECT CAST(1.5 AS INT) AS x").collect()[0]["x"]
    d = duckdb.sql("SELECT CAST(1.5 AS INT)").fetchone()[0]
    assert s == 1 and d == 2 and s != d


def _refusal(expr: str) -> str:
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        _TxnLogWriterBase,
    )

    w = _TxnLogWriterBase.__new__(_TxnLogWriterBase)
    with pytest.raises(ValueError, match="TxnTable.append") as ei:
        w._refuse_unproven_dialect("c", expr)
    return str(ei.value)


def test_refusals_cover_the_divergent_constructs():
    assert "SUBSTRING" in _refusal("substring(s, 0, 3) = 'hel'")
    assert "SUBSTR" in _refusal("substr(s, 0, 3) = 'hel'")
    _refusal("CAST(d AS INT) >= 0")
    _refusal("CAST(d AS BIGINT) >= 0")
    _refusal("CAST(d AS DECIMAL) >= 0")
    assert "REGEXP_LIKE" in _refusal("regexp_like(s, 'a.*b')")
    assert "ROUND" in _refusal("round(d, 0) >= 0")
    assert "IF" in _refusal("if(a > 0, true, false)")


# ---------------------------------------------------------------------------
# end-to-end through the sink
# ---------------------------------------------------------------------------


def test_sink_enforces_allowlisted_constraint(spark, tmp_path):
    p = str(tmp_path / "ok")
    t = TxnTable(spark, p)
    t.append(spark.range(3).select("id").coalesce(1))
    t.add_constraint("pos", "abs(id) >= 0 AND id < 100")
    spark.range(3, 6).select("id").write.format("txnlog").mode(
        "append"
    ).save(p)
    assert TxnTable(spark, p).snapshot().count() == 6
    with pytest.raises(Exception, match="pos"):
        spark.range(100, 103).select("id").write.format("txnlog").mode(
            "append"
        ).save(p)


def test_sink_refuses_unproven_constraint_batch_never_lands(
    spark, tmp_path
):
    p = str(tmp_path / "ref")
    t = TxnTable(spark, p)
    t.append(
        spark.range(3).select(F.col("id").cast("double").alias("d"))
        .coalesce(1)
    )
    # the LIBRARY evaluates this fine; the sink cannot prove parity
    # (Spark truncates the cast, DuckDB rounds) so it must refuse
    t.add_constraint("trunc", "CAST(d AS INT) >= 0")
    v = t.latest_version()
    with pytest.raises(Exception, match="parity|TxnTable.append"):
        spark.range(3, 6).select(
            F.col("id").cast("double").alias("d")
        ).write.format("txnlog").mode("append").save(p)
    assert t.latest_version() == v  # nothing landed
    # the library path still ingests the same batch
    t2 = TxnTable(spark, p)
    t2.append(
        spark.range(3, 6)
        .select(F.col("id").cast("double").alias("d"))
        .coalesce(1)
    )
    assert t2.snapshot().count() == 6
