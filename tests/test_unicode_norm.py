"""NFC canonicalization: Python unicodedata vs DuckDB nfc_normalize
(two independent UAX #15 implementations), the dedup contrast
(byte-level keeps Unicode twins, NFC collapses them), and the
map-only plumbing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.unicode_norm import (
    exact_dedup_nfc,
    nfc_normalize_py,
    nfc_normalize_text,
)

CASES = [
    "café",  # already composed
    "café",  # decomposed → composes
    "Ångstrom",  # ANGSTROM SIGN → U+00C5 (singleton mapping)
    "ﬁnance",  # ligature — NFC-invariant (NFKC would fold)
    "가ngul",  # Hangul jamo → syllable composition
    "plain ascii stays",
    "",
]


def test_python_matches_duckdb_nfc():
    con = duckdb.connect()
    for s in CASES:
        duck = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert nfc_normalize_py(s) == duck, repr(s)


def test_spark_plumbing_matches_python(spark):
    df = spark.createDataFrame(
        list(enumerate(CASES)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text_nfc"]
        for r in nfc_normalize_text(df).collect()
    }
    for i, s in enumerate(CASES):
        assert got[i] == nfc_normalize_py(s), repr(s)


def test_nfc_dedup_collapses_twins_byte_dedup_does_not(spark):
    from churn_model_evaluation_platform_spark.operators.dedup import (
        exact_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, "café au lait"),
            (2, "café au lait"),  # NFC-equivalent twin
            (3, "different text entirely"),
        ],
        "doc_id long, text string",
    )
    byte_rows = exact_dedup(df).collect()
    nfc_rows = exact_dedup_nfc(df).collect()
    assert len(byte_rows) == 3  # byte-level dedup misses the twin
    assert len(nfc_rows) == 2
    winner = {r["doc_id"]: r["n_copies"] for r in nfc_rows}
    assert winner[1] == 2  # min-id kept, both copies counted
    assert winner[3] == 1


def test_none_text_passthrough():
    assert nfc_normalize_py(None) is None


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        nfc_normalize_text(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
