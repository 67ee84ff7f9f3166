"""Cast-audit guard: no oracle may emit a HUGEINT (int128) column.

DuckDB widens SUM(<integer>) to HUGEINT; the driver's correctness hasher
renders int128 differently from Spark's BIGINT, producing a hash-RED row
even when every value is numerically identical (the CORRECTNESS_r06 root
cause — roc_curve_points, lift_curve, confusion_matrix, json_props_agg,
rolling_metrics). Any integer SUM in a final projection must be wrapped
in CAST(... AS BIGINT).

This test binds (does not execute) every ``oracle_sql()`` entry against
DuckDB views of the sf0.001 tables and fails on any HUGEINT/UHUGEINT
output column. Binding also catches oracle syntax errors before the
driver does.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF_DIR = "/root/testdata/sf0.001"


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_oracle_types", os.path.join(_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def oracle_relations():
    from churn_model_evaluation_platform_spark.sources.testdata import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{_SF_DIR}/{t}.parquet'"
        )
    entry = _load_entry()
    yield con, entry.oracle_sql()
    con.close()


def test_every_oracle_binds_and_emits_no_hugeint(oracle_relations):
    con, oracles = oracle_relations
    assert oracles, "oracle_sql() returned nothing"
    offenders: list[str] = []
    bind_errors: list[str] = []
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
            cols = rel.columns
            types = [str(t).upper() for t in rel.types]
        except Exception as e:  # binding failure = broken oracle
            bind_errors.append(f"{name}: {str(e).splitlines()[0][:120]}")
            continue
        bad = [
            f"{name}.{c}:{t}"
            for c, t in zip(cols, types)
            if "HUGEINT" in t or "INT128" in t
        ]
        offenders.extend(bad)
    assert not bind_errors, "oracles failed to bind:\n" + "\n".join(bind_errors)
    assert not offenders, (
        "HUGEINT in oracle output schema — wrap the integer SUM in "
        "CAST(... AS BIGINT) (driver hasher renders int128 differently "
        "from Spark BIGINT):\n" + "\n".join(offenders)
    )
