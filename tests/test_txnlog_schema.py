"""Schema governance on the transactional table: the LOG owns the
table schema — appends validate against it (exact by default, additive
evolution opt-in, type changes never), and reads pin spark.read.schema
to the log's schema so mixed-schema histories are deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import (
    SchemaMismatch,
    TxnTable,
)


def _ab(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )


def test_exact_mode_rejects_drift(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ab(spark, 0, 5))
    with pytest.raises(SchemaMismatch, match="new columns: \\['extra'\\]"):
        t.append(_ab(spark, 5, 8).withColumn("extra", F.lit("x")))
    with pytest.raises(SchemaMismatch, match="missing columns: \\['v'\\]"):
        t.append(spark.range(5, 8).select("id"))
    # rejected appends leave NO trace: no version, no data
    assert t.versions() == [1]
    assert t.snapshot().count() == 5


def test_type_change_never_allowed(spark, tmp_path):
    for mode in ("exact", "additive"):
        t = TxnTable(spark, str(tmp_path / f"tbl_{mode}"), schema_mode=mode)
        t.append(_ab(spark, 0, 5))
        with pytest.raises(SchemaMismatch, match="type changes are never"):
            t.append(
                spark.range(5, 8).select(
                    "id", F.col("id").cast("string").alias("v")
                )
            )


def test_additive_evolution_reads_null_backfill(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), schema_mode="additive")
    t.append(_ab(spark, 0, 3))
    t.append(_ab(spark, 3, 6).withColumn("tag", F.lit("new")))
    snap = t.snapshot()
    assert [f.name for f in snap.schema.fields] == ["id", "v", "tag"]
    rows = {r["id"]: r["tag"] for r in snap.collect()}
    assert rows[0] is None and rows[5] == "new"  # old files: NULL backfill
    # omitting an existing column is also fine in additive mode
    t.append(spark.range(6, 8).select("id"))
    got = {r["id"]: (r["v"], r["tag"]) for r in t.snapshot().collect()}
    assert got[7] == (None, None)
    assert got[1] == (2.0, None)


def test_time_travel_sees_old_schema(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), schema_mode="additive")
    t.append(_ab(spark, 0, 3))
    t.append(_ab(spark, 3, 6).withColumn("tag", F.lit("new")))
    old = t.snapshot(version=1)
    assert [f.name for f in old.schema.fields] == ["id", "v"]


def test_overwrite_redefines_schema(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))  # exact mode
    t.append(_ab(spark, 0, 3))
    t.overwrite(
        spark.createDataFrame([Row(k="a", n=1)], "k string, n long")
    )
    assert [f.name for f in t.snapshot().schema.fields] == ["k", "n"]
    # and the new schema becomes the exact-mode baseline
    with pytest.raises(SchemaMismatch):
        t.append(_ab(spark, 0, 3))


def test_scan_pins_log_schema_after_evolution(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), schema_mode="additive")
    t.append(_ab(spark, 0, 100).coalesce(1))
    t.append(
        _ab(spark, 100, 200).withColumn("tag", F.lit("x")).coalesce(1)
    )
    out = t.scan([("id", "<", 50)])
    assert [f.name for f in out.schema.fields] == ["id", "v", "tag"]
    assert out.count() == 50
    # predicate on the evolved column: the old file has no stats for it
    # (and no values) — conservative keep + NULL-rejecting residual
    rep = t.prune_report([("tag", "=", "x")])
    assert rep["kept"] == 2  # old file kept (no stats for tag)
    assert t.scan([("tag", "=", "x")]).count() == 100


def test_pre_schema_history_still_reads(spark, tmp_path):
    """Commits written before schema governance carry no table_schema:
    reads fall back to plain parquet reads, appends validate only from
    the first schema-bearing commit on."""
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ab(spark, 0, 3))
    # simulate a legacy commit: strip the schema keys from the log entry
    import json as _json

    jp = t._log_path(1)
    entry = t._read_json(jp)
    entry.pop("table_schema", None)
    t._fs.delete(jp, False)
    out = t._fs.create(jp, True)
    try:
        out.write(bytearray(_json.dumps(entry).encode("utf-8")))
    finally:
        out.close()
    t2 = TxnTable(spark, str(tmp_path / "tbl"))
    assert t2._state()["schema"] is None
    assert t2.snapshot().count() == 3
    t2.append(_ab(spark, 3, 5))  # first schema-bearing commit
    assert t2._state()["schema"] is not None
    assert t2.snapshot().count() == 5
