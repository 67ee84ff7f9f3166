"""Generated columns on the transactional table (sources/txnlog.py
TxnTable.generated_columns, Delta's generated columns): missing
columns are derived at write time, provided values are validated
null-safe row-by-row, SET on a generated column is refused while
updates to source columns RECOMPUTE it, the map is a durable table
property (adopt-or-conflict like the partition layout), the native
sink refuses tables it cannot derive for, and the `generated` protocol
feature makes feature-less guard-aware builds refuse the table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources import protocol as P
from churn_model_evaluation_platform_spark.sources.txnlog import (
    ConstraintViolation,
    TxnTable,
)


def _events(spark, n=5):
    return spark.createDataFrame(
        [(f"2024-01-{i:02d} 10:00:00", float(i)) for i in range(1, n + 1)],
        "ts_s string, v double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "v")


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(
        spark,
        str(tmp_path / "t"),
        partition_by=["day"],
        generated_columns={"day": "CAST(ts AS DATE)"},
    )
    t.append(_events(spark).coalesce(1))
    return t


def test_missing_generated_column_is_derived(table):
    rows = {r["v"]: str(r["day"]) for r in table.snapshot().collect()}
    assert rows == {float(i): f"2024-01-{i:02d}" for i in range(1, 6)}


def test_generated_partition_prunes(table):
    rep = table.prune_report([("day", "=", "2024-01-02")])
    assert rep == {"total": 5, "kept": 1, "pruned": 4}


def test_fresh_handle_adopts_the_map(spark, table):
    t2 = TxnTable(spark, table.path)
    t2.append(_events(spark, 1).coalesce(1))
    assert t2.snapshot().count() == 6
    assert t2.generated_columns == {"day": "CAST(ts AS DATE)"}


def test_conflicting_respecification_raises(spark, table):
    t3 = TxnTable(
        spark, table.path, generated_columns={"day": "CAST(v AS DATE)"}
    )
    with pytest.raises(ValueError, match="generated columns"):
        t3.append(_events(spark, 1).coalesce(1))


def test_provided_wrong_values_raise(spark, table):
    bad = _events(spark, 2).withColumn(
        "day", F.lit("1999-01-01").cast("date")
    )
    with pytest.raises(ConstraintViolation, match="generated column"):
        table.append(bad.coalesce(1))
    # provided-and-correct passes (Delta's contract)
    good = _events(spark, 1).withColumn("day", F.col("ts").cast("date"))
    table.append(good.coalesce(1))
    assert table.snapshot().count() == 6


def test_set_on_generated_refused_update_recomputes(table):
    with pytest.raises(ValueError, match="derived"):
        table.update([("v", "=", 1.0)], {"day": F.lit("1999-01-01")})
    with pytest.raises(ValueError, match="derived"):
        table.update_dv([("v", "=", 1.0)], {"day": F.lit("1999-01-01")})
    # CoW update of the SOURCE column recomputes the generated one
    table.update(
        [("v", "=", 1.0)], {"ts": F.expr("ts + INTERVAL 40 DAYS")}
    )
    (r,) = table.snapshot().where("v = 1.0").collect()
    assert str(r["day"]) == "2024-02-10"
    # merge-on-read update too
    table.update_dv(
        [("v", "=", 2.0)], {"ts": F.expr("ts + INTERVAL 40 DAYS")}
    )
    (r2,) = table.snapshot().where("v = 2.0").collect()
    assert str(r2["day"]) == "2024-02-11"


def test_merge_dv_recomputes_generated(spark, table):
    changes = spark.createDataFrame(
        [("2024-03-05 09:00:00", 3.0, "U", 1)],
        "ts_s string, v double, op string, seq int",
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "v", "op", "seq"
    )
    table.merge_dv(changes, keys=["v"], order_cols=["seq"])
    (r,) = table.snapshot().where("v = 3.0").collect()
    assert str(r["day"]) == "2024-03-05"


def test_expression_may_not_reference_generated(spark, tmp_path):
    with pytest.raises(ValueError, match="may not reference"):
        TxnTable(
            spark,
            str(tmp_path / "t"),
            generated_columns={"day": "CAST(ts AS DATE)", "d2": "day"},
        )


def test_sink_refuses_generated_tables(spark, table):
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    with pytest.raises(Exception, match="generated"):
        _events(spark, 1).coalesce(1).write.format("txnlog").mode(
            "append"
        ).save(table.path)


def test_featureless_reader_refuses(spark, table):
    old = P.KNOWN_FEATURES
    P.KNOWN_FEATURES = frozenset(old - {"generated"})
    try:
        with pytest.raises(P.ProtocolError, match="generated"):
            TxnTable(spark, table.path)._state()
    finally:
        P.KNOWN_FEATURES = old


def test_generated_survives_checkpoint(spark, tmp_path):
    t = TxnTable(
        spark,
        str(tmp_path / "t"),
        checkpoint_interval=2,
        generated_columns={"day": "CAST(ts AS DATE)"},
    )
    for i in range(4):  # crosses checkpoint boundaries
        t.append(_events(spark, 1).coalesce(1))
    fresh = TxnTable(spark, str(tmp_path / "t"))
    assert fresh.generated_columns == {"day": "CAST(ts AS DATE)"}
    # and the derived values kept landing after adoption
    assert fresh.snapshot().where("day IS NULL").count() == 0
